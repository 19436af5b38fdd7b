"""Zstandard decoder: pure Python, RFC 8878.

The modern corpus shard compression (`.jsonl.zst` — The Pile,
RedPajama, many HF datasets) decoded without a codec library, the
`sources/lz4frame.py` pattern: frame header walk (window descriptor,
dictionary id, content size, checksum flag), skippable frames,
raw/RLE/compressed blocks, the four literals modes (raw, RLE,
Huffman-compressed with direct or FSE-compressed weight descriptions,
treeless reuse), single- and four-stream Huffman, full FSE machinery
(FSE_readNCount header parse with the variable-threshold small-value
encoding, table spread with the "less than 1" tail cells, the
two-state interleaved weight decode), sequence decode over the
backward bitstream (predefined / RLE / FSE-compressed / repeat modes
for LL/OF/ML), the three-slot repeat-offset history with the
literals_length==0 quirk, overlap-safe match copy, and the XXH64
content checksum (via functions/xxh.py, verified when present).

Witness (tests): the container's libzstd.so.1 via ctypes — streams
compressed by the normative implementation across levels 1..19,
content classes that force every block and literals mode, multi-block
(>128 KiB) frames, multi-frame concatenations and skippable frames
must all decode byte-exact; truncation and checksum tampering raise.

Dictionaries are not supported (corpus shards are self-contained);
a dictionary id in the frame header raises NotImplementedError.

Throughput note (the lz4frame compatibility-path contract): ~0.7 MB/s
single-threaded pure-Python decode (measured, level-9 word-soup) —
each shard decompresses independently inside Arrow-batched mapInPandas
so the work distributes per-object across executors, and for
steady-state 100 TB ingest you transcode once or install a native
codec; this path exists so the engine can READ the world's shards with
zero out-of-band dependencies.

Reference scope note: the reference engine reads gzip objects; this
module belongs to the repo's source-decompression extension surface
beside sources/lz4frame.py (OP-SRC-DECOMP).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_LO = 0x184D2A50

#: Predefined FSE distributions (RFC 8878 3.1.1.3.2.2) — byte-compared
#: against libzstd's in-binary copies by the tests.
LL_DEFAULTS = (4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2,
               2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
ML_DEFAULTS = (1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
OF_DEFAULTS = (1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
LL_DEFAULT_LOG, ML_DEFAULT_LOG, OF_DEFAULT_LOG = 6, 6, 5

#: Literals-length code -> (baseline, extra bits) for codes >= 16;
#: codes 0..15 are the literal value itself with 0 extra bits.
LL_EXTRA = ((16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2),
            (32, 3), (40, 3), (48, 4), (64, 6), (128, 7), (256, 8),
            (512, 9), (1024, 10), (2048, 11), (4096, 12), (8192, 13),
            (16384, 14), (32768, 15), (65536, 16))
#: Match-length code -> (baseline, extra bits) for codes >= 32;
#: codes 0..31 are length code+3 with 0 extra bits.
ML_EXTRA = ((35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2),
            (51, 3), (59, 3), (67, 4), (83, 4), (99, 5), (131, 7),
            (259, 8), (515, 9), (1027, 10), (2051, 11), (4099, 12),
            (8195, 13), (16387, 14), (32771, 15), (65539, 16))


class ZstdError(ValueError):
    """Malformed zstd stream (never silently wrong bytes)."""


class ZstdDictionaryError(ZstdError, NotImplementedError):
    """Spec-valid but undecodable here: frame needs an external
    dictionary. Subclasses BOTH ZstdError (so the ndjson ingest skip
    tuple treats the object as undecodable and skips it, matching the
    reference's fall-back-on-any-decode-failure contract,
    JsonEventS3Iterator.java:162-167) and NotImplementedError (so
    direct codec callers still see a loud capability gate)."""


#: Optional coverage hook: tests set this to a collections.Counter to
#: record which decode paths a corpus actually exercised (block types,
#: literals modes, stream counts, weight description forms, sequence
#: table modes) — so witness coverage can be ASSERTED, not assumed.
stats = None


def _tick(key: str) -> None:
    if stats is not None:
        stats[key] += 1


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.data) * 8:
            raise ZstdError("FSE header bitstream truncated")
        v = 0
        shift = 0
        while n > 0:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            v |= ((byte >> (p & 7)) & ((1 << take) - 1)) << shift
            shift += take
            p += take
            n -= take
        self.pos = p
        return v

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bitstream (RFC 3.1.1.6): bits are written LSB-first
    forward; reading starts below the final padding 1-bit and proceeds
    toward the start. Reads past the start zero-fill (the huff0 peek
    convention); `exhausted` marks byte-exact consumption."""

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty backward bitstream")
        self.val = int.from_bytes(data, "little")
        last = data[-1]
        if last == 0:
            raise ZstdError("backward bitstream missing start bit")
        self.bitpos = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        self.bitpos -= n
        if self.bitpos >= 0:
            return (self.val >> self.bitpos) & ((1 << n) - 1)
        return (self.val << -self.bitpos) & ((1 << n) - 1)

    def remaining(self) -> int:
        return self.bitpos


def _fse_read_ncount(br: _FwdBits, max_symbols: int):
    """FSE table description (RFC 4.1.1): returns (accuracy_log,
    [normalized counts]), counts in -1..2^log, summing (abs) to
    2^log."""
    accuracy_log = br.read(4) + 5
    if accuracy_log > 9:
        raise ZstdError(f"FSE accuracy log {accuracy_log} too large")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb_bits = accuracy_log + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbols:
        if prev_zero:
            rep = br.read(2)
            while rep == 3:
                counts += [0, 0, 0]
                rep = br.read(2)
            counts += [0] * rep
            prev_zero = False
            continue
        small_cut = (2 * threshold - 1) - remaining
        value = br.read(nb_bits - 1)
        if value < small_cut:
            count = value
        else:
            value += br.read(1) << (nb_bits - 1)
            count = value if value < threshold \
                else value - small_cut
        count -= 1                           # stored +1; 0 means -1
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            threshold >>= 1
            nb_bits -= 1
    if remaining != 1:
        raise ZstdError("FSE counts do not sum to table size")
    return accuracy_log, counts


def _fse_build(counts, accuracy_log):
    """Decoding table: position -> (symbol, nb_bits, baseline) via the
    spread + symbolNext assignment (the FSE_buildDTable form)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE table spread did not close")
    nxt = [max(c, 0) if c != -1 else 1 for c in counts]
    table = []
    for u in range(size):
        s = symbols[u]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        table.append((s, nb, (x << nb) - size))
    return table


class _FseState:
    __slots__ = ("table", "state")

    def __init__(self, table, bits: _BackBits, accuracy_log: int):
        self.table = table
        self.state = bits.read(accuracy_log)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackBits) -> None:
        _s, nb, base = self.table[self.state]
        self.state = base + bits.read(nb)


def _huff_weights(data: bytes):
    """Huffman tree description -> (lengths per symbol, bytes used)."""
    if not data:
        raise ZstdError("missing huffman tree description")
    hb = data[0]
    _tick("weights_direct" if hb >= 128 else "weights_fse")
    if hb >= 128:                            # direct 4-bit weights
        n = hb - 127
        nbytes = (n + 1) >> 1
        if len(data) < 1 + nbytes:
            raise ZstdError("huffman weights truncated")
        weights = []
        for i in range(n):
            byte = data[1 + (i >> 1)]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0xF))
        used = 1 + nbytes
    else:                                    # FSE-compressed weights
        comp = data[1:1 + hb]
        if len(comp) < hb:
            raise ZstdError("huffman weight stream truncated")
        fw = _FwdBits(comp)
        alog, counts = _fse_read_ncount(fw, 255)
        if alog > 6:
            raise ZstdError("huffman weight accuracy log > 6")
        table = _fse_build(counts, alog)
        back = _BackBits(comp[fw.bytes_consumed():])
        s1 = _FseState(table, back, alog)
        s2 = _FseState(table, back, alog)
        weights = []
        cur, other = s1, s2
        while len(weights) < 255:
            weights.append(cur.symbol())
            if back.remaining() < cur.table[cur.state][1]:
                weights.append(other.symbol())
                break
            cur.update(back)
            cur, other = other, cur
        used = 1 + hb
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("empty huffman weight set")
    max_bits = total.bit_length()            # ceil for the implied last
    left = (1 << max_bits) - total
    lw = left.bit_length() - 1
    if (1 << lw) != left:
        raise ZstdError("huffman weights do not complete a power of 2")
    weights.append(lw + 1)
    lengths = [0 if w == 0 else max_bits + 1 - w for w in weights]
    return lengths, used


def _huff_table(lengths):
    """(table of 2^max_bits (symbol, nbits) entries, max_bits): ranges
    assigned per weight ascending, symbols in natural order within a
    weight (the huff0 layout)."""
    max_bits = max(lengths)
    size = 1 << max_bits
    table = [None] * size
    pos = 0
    for ln in range(max_bits, 0, -1):        # longest codes first
        for sym, sl in enumerate(lengths):
            if sl != ln:
                continue
            span = 1 << (max_bits - ln)
            for k in range(span):
                table[pos + k] = (sym, ln)
            pos += span
    if pos != size:
        raise ZstdError("huffman lengths do not fill the table")
    return table, max_bits


def _huff_decode_stream(data: bytes, table, max_bits: int,
                        count: int) -> bytearray:
    bits = _BackBits(data)
    out = bytearray()
    for _ in range(count):
        idx = bits.read(max_bits)
        sym, ln = table[idx]
        bits.bitpos += max_bits - ln         # consume only ln bits
        out.append(sym)
        if bits.bitpos < -max_bits:
            raise ZstdError("huffman literal stream over-read")
    return out


def _decode_literals(block: bytes, huff_state: list):
    """Literals section -> (literals bytes, bytes consumed). huff_state
    is a 1-element list carrying the previous (table, max_bits) for
    treeless blocks."""
    if not block:
        raise ZstdError("empty block body")
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    _tick(f"lit_type_{lit_type}")
    if lit_type in (0, 1):                   # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if lit_type == 0:
            if len(block) < hdr + regen:
                raise ZstdError("raw literals truncated")
            return bytes(block[hdr:hdr + regen]), hdr + regen
        return bytes([block[hdr]]) * regen, hdr + 1
    # compressed (2) / treeless (3)
    if size_format == 0:
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12)
        regen = v & 0x3FF
        comp = v >> 10
        hdr = 3
        streams = 1
    elif size_format == 1:
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12)
        regen = v & 0x3FF
        comp = v >> 10
        hdr = 3
        streams = 4
    elif size_format == 2:
        v = b0 >> 4 | (block[1] << 4) | (block[2] << 12) \
            | (block[3] << 20)
        regen = v & 0x3FFF
        comp = v >> 14
        hdr = 4
        streams = 4
    else:
        v = (b0 >> 4 | (block[1] << 4) | (block[2] << 12)
             | (block[3] << 20) | (block[4] << 28))
        regen = v & 0x3FFFF
        comp = v >> 18
        hdr = 5
        streams = 4
    body = block[hdr:hdr + comp]
    if len(body) < comp:
        raise ZstdError("compressed literals truncated")
    _tick(f"lit_streams_{streams}")
    if lit_type == 2:
        lengths, used = _huff_weights(body)
        huff_state[0] = _huff_table(lengths)
        body = body[used:]
    elif huff_state[0] is None:
        raise ZstdError("treeless literals with no previous table")
    table, max_bits = huff_state[0]
    if streams == 1:
        lits = _huff_decode_stream(body, table, max_bits, regen)
    else:
        if len(body) < 6:
            raise ZstdError("missing 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        parts = []
        off = 6
        per = (regen + 3) >> 2
        for i, sz in enumerate((s1, s2, s3, len(body) - 6 - s1 - s2
                                - s3)):
            if sz <= 0 and regen:
                raise ZstdError("bad 4-stream sizes")
            n = per if i < 3 else regen - 3 * per
            parts.append(_huff_decode_stream(
                body[off:off + sz], table, max_bits, n))
            off += sz
        lits = b"".join(parts)
    if len(lits) != regen:
        raise ZstdError("literal count mismatch")
    return bytes(lits), hdr + comp


def _seq_table(mode: int, br_data: bytes, pos: int, defaults,
               default_log: int, max_sym: int, prev):
    """One symbol-compression-mode table: returns (table, accuracy_log,
    new_pos, new_prev)."""
    _tick(f"seq_mode_{mode}")
    if mode == 0:                            # predefined
        t = _fse_build(list(defaults), default_log)
        return t, default_log, pos, (t, default_log)
    if mode == 1:                            # RLE
        sym = br_data[pos]
        if sym > max_sym:
            raise ZstdError("RLE sequence symbol out of range")
        t = [(sym, 0, 0)]
        return t, 0, pos + 1, (t, 0)
    if mode == 2:                            # FSE description
        fw = _FwdBits(br_data[pos:])
        alog, counts = _fse_read_ncount(fw, max_sym)
        if len(counts) - 1 > max_sym:
            raise ZstdError("FSE description has too many symbols")
        t = _fse_build(counts, alog)
        return t, alog, pos + fw.bytes_consumed(), (t, alog)
    if prev is None:                         # repeat
        raise ZstdError("repeat sequence mode with no previous table")
    return prev[0], prev[1], pos, prev


def _decode_block(body: bytes, out: bytearray, huff_state: list,
                  seq_state: dict, rep: list) -> None:
    lits, pos = _decode_literals(body, huff_state)
    if pos >= len(body):
        raise ZstdError("missing sequences section")
    n = body[pos]
    pos += 1
    if n == 0:
        out += lits
        return
    if n < 128:
        count = n
    elif n < 255:
        count = ((n - 128) << 8) + body[pos]
        pos += 1
    else:
        count = struct.unpack_from("<H", body, pos)[0] + 0x7F00
        pos += 2
    modes = body[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ll_t, ll_log, pos, seq_state["ll"] = _seq_table(
        (modes >> 6) & 3, body, pos, LL_DEFAULTS, LL_DEFAULT_LOG, 35,
        seq_state.get("ll"))
    of_t, of_log, pos, seq_state["of"] = _seq_table(
        (modes >> 4) & 3, body, pos, OF_DEFAULTS, OF_DEFAULT_LOG, 31,
        seq_state.get("of"))
    ml_t, ml_log, pos, seq_state["ml"] = _seq_table(
        (modes >> 2) & 3, body, pos, ML_DEFAULTS, ML_DEFAULT_LOG, 52,
        seq_state.get("ml"))
    bits = _BackBits(body[pos:])
    ll_s = _FseState(ll_t, bits, ll_log)
    of_s = _FseState(of_t, bits, of_log)
    ml_s = _FseState(ml_t, bits, ml_log)
    lit_pos = 0
    for i in range(count):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ZstdError("offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_s.symbol()
        if ml_code <= 31:
            match_len = ml_code + 3
        else:
            base, nb = ML_EXTRA[ml_code - 32]
            match_len = base + bits.read(nb)
        ll_code = ll_s.symbol()
        if ll_code <= 15:
            lit_len = ll_code
        else:
            base, nb = LL_EXTRA[ll_code - 16]
            lit_len = base + bits.read(nb)
        # repeat-offset history (RFC 3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1
            if lit_len == 0:
                idx += 1
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[idx] if idx < 3 else rep[0] - 1
                if offset == 0:
                    raise ZstdError("zero repeat offset")
                if idx == 1:
                    rep[1], rep[0] = rep[0], offset
                else:
                    rep[2] = rep[1]
                    rep[1] = rep[0]
                    rep[0] = offset
        if lit_pos + lit_len > len(lits):
            raise ZstdError("literal run past literals section")
        out += lits[lit_pos:lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("match offset past window start")
        if offset >= match_len:
            start = len(out) - offset
            out += out[start:start + match_len]
        else:
            for _ in range(match_len):       # overlapping copy
                out.append(out[-offset])
        if i + 1 < count:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    if bits.remaining() != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += lits[lit_pos:]


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress a (possibly multi-frame) zstd stream. Skippable
    frames are skipped; the XXH64 content checksum is verified when
    present; dictionaries raise NotImplementedError."""
    out_all = bytearray()
    i = 0
    while i < len(data):
        if i + 4 > len(data):
            raise ZstdError("truncated frame magic")
        magic = struct.unpack_from("<I", data, i)[0]
        if (magic & 0xFFFFFFF0) == SKIPPABLE_LO:
            if i + 8 > len(data):
                raise ZstdError("truncated skippable frame")
            sz = struct.unpack_from("<I", data, i + 4)[0]
            i += 8 + sz
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad zstd magic {magic:#x}")
        i += 4
        fhd = data[i]
        i += 1
        fcs_flag = fhd >> 6
        single_segment = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        dict_flag = fhd & 3
        if fhd & 0x08:
            raise ZstdError("reserved frame header bit set")
        if not single_segment:
            i += 1                           # window descriptor
        if dict_flag:
            raise ZstdDictionaryError(
                "zstd dictionaries not supported (corpus shards are "
                "self-contained)")
        fcs_bytes = (single_segment, 2, 4, 8)[fcs_flag] \
            if fcs_flag else (1 if single_segment else 0)
        content_size = None
        if fcs_bytes:
            raw = data[i:i + fcs_bytes]
            if len(raw) < fcs_bytes:
                raise ZstdError("truncated content size")
            content_size = int.from_bytes(raw, "little")
            if fcs_bytes == 2:
                content_size += 256
            i += fcs_bytes
        out = bytearray()
        huff_state = [None]
        seq_state: dict = {}
        rep = [1, 4, 8]
        while True:
            if i + 3 > len(data):
                raise ZstdError("truncated block header")
            bh = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            i += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            _tick(f"block_{btype}")
            if btype == 0:                   # raw
                if i + bsize > len(data):
                    raise ZstdError("truncated raw block")
                out += data[i:i + bsize]
                i += bsize
            elif btype == 1:                 # RLE
                if i >= len(data):
                    raise ZstdError("truncated RLE block")
                out += bytes([data[i]]) * bsize
                i += 1
            elif btype == 2:
                if i + bsize > len(data):
                    raise ZstdError("truncated compressed block")
                _decode_block(data[i:i + bsize], out, huff_state,
                              seq_state, rep)
                i += bsize
            else:
                raise ZstdError("reserved block type")
            if len(out) + len(out_all) > max_output:
                raise ZstdError("output exceeds max_output")
            if last:
                break
        if content_size is not None and len(out) != content_size:
            raise ZstdError(
                f"content size mismatch: {len(out)} != {content_size}")
        if checksum:
            if i + 4 > len(data):
                raise ZstdError("truncated content checksum")
            from .xxh import xxh64
            want = struct.unpack_from("<I", data, i)[0]
            got = xxh64(bytes(out), seed=0) & 0xFFFFFFFF
            if got != want:
                raise ZstdError("content checksum mismatch")
            i += 4
        out_all += out
    return bytes(out_all)
