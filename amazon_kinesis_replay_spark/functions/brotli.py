"""Brotli decoder: pure Python, RFC 7932.

The web-corpus compression (HTTP `Content-Encoding: br` payloads in
modern crawls, `.br` shards) decoded without a codec library: stream
header (window bits), metadata and uncompressed meta-blocks, the
variable-length block-type machinery for all three categories
(literals / insert-and-copy / distances) with block-switch commands,
simple and complex prefix codes (incl. the fixed code-length code,
skip counts and brotli's ACCUMULATING 16/17 repeat semantics), context
modes (LSB6/MSB6/UTF8/Signed via the 2048-byte context LUT), context
maps with RLE zero-runs and the inverse-move-to-front transform, the
distance ring buffer with the 16 compound codes and
NPOSTFIX/NDIRECT-parameterized long distances, and the RFC's static
dictionary with its 121 word transforms (omit-first/last, uppercase
first/all, affixes).

Fixed data lives in brotli_tables.py (extracted from libbrotlicommon's
EXPORTED dictionary/transform accessors; see that module). The tests
witness this decoder bidirectionally against the container's
libbrotlienc/libbrotlidec across qualities 0..11, window sizes and
content classes, with decode-path coverage asserted via a stats hook.

Throughput note: ~1.3 MB/s single-threaded pure-Python decode
(measured) — the same per-object-distributed compatibility-path
contract as functions/zstd.py (see its docstring).

Reference scope note: the reference engine reads gzip objects; this
module belongs to the repo's source-decompression extension surface
beside functions/zstd.py and sources/lz4frame.py (OP-SRC-DECOMP).
"""

from __future__ import annotations

from .brotli_tables import (CONTEXT_LUT, DICT_OFFSETS_BY_LENGTH,
                            DICT_SIZE_BITS_BY_LENGTH, DICTIONARY,
                            TRANSFORMS)


class BrotliError(ValueError):
    """Malformed brotli stream (never silently wrong bytes)."""


#: Optional coverage hook (tests set to a Counter) — see zstd.py.
stats = None


def _tick(key: str) -> None:
    if stats is not None:
        stats[key] += 1


# --- fixed code tables (RFC 7932 §3.5, §5, §9.1-9.2) ---------------------

CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
#: 4-bit-peek fixed code for code-length code lengths: idx -> (bits, value)
CL_PREFIX = tuple(zip(
    (2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4),
    (0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)))

BLOCK_LEN_BASE = (1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145,
                  177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
                  8433, 16625)
BLOCK_LEN_BITS = (2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6,
                  7, 8, 9, 10, 11, 12, 13, 24)

INSERT_BASE = (0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
               130, 194, 322, 578, 1090, 2114, 6210, 22594)
INSERT_BITS = (0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8,
               9, 10, 12, 14, 24)
COPY_BASE = (2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70,
             102, 134, 198, 326, 582, 1094, 2118)
COPY_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7,
             8, 9, 10, 24)
INSERT_RANGE_LUT = (0, 0, 8, 8, 0, 16, 8, 16, 16)
COPY_RANGE_LUT = (0, 8, 0, 8, 16, 0, 16, 8, 16)


class _Bits:
    """Forward LSB-first bit reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.data) * 8:
            raise BrotliError("bitstream truncated")
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

    def bit(self) -> int:
        return self.bits(1)

    def peek(self, n: int) -> int:
        save = self.pos
        end = len(self.data) * 8
        avail = end - save
        if avail >= n:
            v = self.bits(n)
        else:
            v = self.bits(avail) if avail else 0
        self.pos = save
        return v

    def align(self) -> None:
        pad = (-self.pos) % 8
        if pad and self.bits(pad) != 0:
            raise BrotliError("non-zero padding at byte alignment")

    def take_bytes(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise BrotliError("uncompressed bytes truncated")
        self.pos += 8 * n
        return self.data[start:start + n]


class _Prefix:
    """Canonical prefix code, decoded over the LSB-first stream with
    DEFLATE-style bit-reversed codes. A single-symbol code reads zero
    bits."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise BrotliError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        kraft = sum(1 << (15 - ln) for ln, _ in nz)
        if kraft != 1 << 15:
            raise BrotliError("prefix code not complete")
        nz.sort()
        self.max_len = nz[-1][0]
        table = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            table[(ln, rev)] = sym
            code += 1
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        ln = 0
        table = self.table
        while True:
            acc |= br.bit() << ln
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
            if ln > 15:
                raise BrotliError("invalid prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet: int) -> _Prefix:
    two = br.bits(2)
    if two == 1:                              # simple code
        _tick("code_simple")
        nsym = br.bits(2) + 1
        abits = max(1, (alphabet - 1).bit_length())
        syms = []
        for _ in range(nsym):
            s = br.bits(abits)
            if s >= alphabet:
                raise BrotliError("simple-code symbol out of range")
            syms.append(s)
        lengths = [0] * alphabet
        if nsym == 1:
            lengths[syms[0]] = 1
            p = _Prefix.__new__(_Prefix)
            p.single = syms[0]
            p.table = None
            p.max_len = 0
            return p
        if nsym == 2:
            if syms[0] == syms[1]:
                raise BrotliError("duplicate simple-code symbol")
            syms.sort()
            lengths[syms[0]] = lengths[syms[1]] = 1
        elif nsym == 3:
            if len(set(syms)) != 3:
                raise BrotliError("duplicate simple-code symbol")
            a, b, c = syms
            if b > c:
                b, c = c, b
            lengths[a] = 1
            lengths[b] = lengths[c] = 2
        else:
            if len(set(syms)) != 4:
                raise BrotliError("duplicate simple-code symbol")
            if br.bit():                      # tree-select: 1,2,3,3
                a, b, c, d = syms
                if c > d:
                    c, d = d, c
                lengths[a] = 1
                lengths[b] = 2
                lengths[c] = lengths[d] = 3
            else:
                for s in sorted(syms):
                    lengths[s] = 2
        return _Prefix(lengths)
    # complex code: `two` is the number of skipped code-length symbols
    _tick("code_complex")
    hskip = two
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        idx = br.peek(4)
        ln, val = CL_PREFIX[idx]
        br.bits(ln)
        cl_lengths[CL_ORDER[i]] = val
        if val:
            space -= 32 >> val
            num_codes += 1
            if space <= 0:
                break
    if num_codes != 1 and space != 0:
        raise BrotliError("code-length code not complete")
    cl_code = _Prefix(cl_lengths)
    lengths = [0] * alphabet
    space = 32768
    prev_code_len = 8
    repeat = 0
    repeat_code_len = 0
    i = 0
    while i < alphabet and space > 0:
        sym = cl_code.read(br)
        if sym < 16:
            repeat = 0
            lengths[i] = sym
            i += 1
            if sym:
                prev_code_len = sym
                space -= 32768 >> sym
        else:
            # brotli's ACCUMULATING repeats (RFC 3.5): consecutive
            # same-kind repeat codes extend the previous TOTAL —
            # repeat = ((repeat - 2) << extra_bits) + 3 + extra — and
            # only the delta beyond what was already written is emitted
            new_len = prev_code_len if sym == 16 else 0
            extra_bits = 2 if sym == 16 else 3
            if repeat_code_len != new_len:
                repeat = 0
                repeat_code_len = new_len
            old_repeat = repeat
            if repeat > 0:
                repeat = (repeat - 2) << extra_bits
            repeat += br.bits(extra_bits) + 3
            delta = repeat - old_repeat
            if i + delta > alphabet:
                raise BrotliError("repeat past alphabet end")
            for k in range(delta):
                lengths[i + k] = new_len
            i += delta
            if new_len:
                space -= delta * (32768 >> new_len)
    if space != 0:
        raise BrotliError("prefix code lengths not complete")
    return _Prefix(lengths)


def _decode_varlen_u8(br: _Bits) -> int:
    if not br.bit():
        return 0
    nbits = br.bits(3)
    if nbits == 0:
        return 1
    return br.bits(nbits) + (1 << nbits)


def _read_block_switch_codes(br: _Bits, nbltypes: int):
    type_code = _read_prefix_code(br, nbltypes + 2)
    count_code = _read_prefix_code(br, 26)
    count = _read_block_count(br, count_code)
    return type_code, count_code, count


def _read_block_count(br: _Bits, code: _Prefix) -> int:
    sym = code.read(br)
    return BLOCK_LEN_BASE[sym] + br.bits(BLOCK_LEN_BITS[sym])


def _read_context_map(br: _Bits, n_trees: int, size: int):
    if n_trees == 1:
        return bytes(size)
    _tick("context_map")
    rlemax = (br.bits(4) + 1) if br.bit() else 0
    code = _read_prefix_code(br, n_trees + rlemax)
    cmap = bytearray()
    while len(cmap) < size:
        sym = code.read(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            run = (1 << sym) + br.bits(sym)
            if len(cmap) + run > size:
                raise BrotliError("context-map zero run too long")
            cmap += bytes(run)
        else:
            cmap.append(sym - rlemax)
    if br.bit():                              # inverse move-to-front
        _tick("context_map_imtf")
        mtf = list(range(256))
        for k, v in enumerate(cmap):
            val = mtf[v]
            cmap[k] = val
            if v:
                del mtf[v]
                mtf.insert(0, val)
    if max(cmap) >= n_trees:
        raise BrotliError("context map value out of range")
    return bytes(cmap)


def _transform_word(word: bytes, tid: int) -> bytes:
    prefix, ttype, suffix = TRANSFORMS[tid]
    if ttype == 0:
        mid = word
    elif 1 <= ttype <= 9:                     # omit last N
        mid = word[:-ttype] if ttype < len(word) else b""
    elif ttype in (10, 11):                   # uppercase first / all
        b = bytearray(word)
        k = 0
        while k < len(b):
            c = b[k]
            if c < 0xC0:
                if 0x61 <= c <= 0x7A:
                    b[k] ^= 32
                step = 1
            elif c < 0xE0:
                if k + 1 < len(b):
                    b[k + 1] ^= 32
                step = 2
            else:
                if k + 2 < len(b):
                    b[k + 2] ^= 5
                step = 3
            if ttype == 10:
                break
            k += step
        mid = bytes(b)
    elif 12 <= ttype <= 20:                   # omit first N
        n = ttype - 11
        mid = word[n:] if n < len(word) else b""
    else:
        raise BrotliError(f"invalid transform type {ttype}")
    return prefix + mid + suffix


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decompress a brotli stream."""
    br = _Bits(data)
    # window bits (RFC 9.1)
    if br.bit() == 0:
        wbits = 16
    else:
        n = br.bits(3)
        if n != 0:
            wbits = 17 + n
        else:
            n = br.bits(3)
            if n == 0:
                wbits = 17
            elif n == 1:
                raise BrotliError("reserved WBITS code")
            else:
                wbits = 8 + n
    window = (1 << wbits) - 16
    out = bytearray()
    # most-recent-first; RFC 10's initial ring (16,15,11,4) is stored
    # oldest-first in libbrotli — the initial LAST distance is 4
    ring = [4, 11, 15, 16]

    while True:
        islast = br.bit()
        if islast and br.bit():               # ISLASTEMPTY
            break
        mnibbles = br.bits(2)
        if mnibbles == 3:                     # metadata meta-block
            _tick("metablock_meta")
            if br.bit():
                raise BrotliError("reserved metadata bit set")
            mskipbytes = br.bits(2)
            mskip = 0
            if mskipbytes:
                mskip = br.bits(8 * mskipbytes)
                if mskipbytes > 1 and (mskip >> (8 * (mskipbytes - 1))) \
                        == 0:
                    raise BrotliError("non-minimal MSKIPLEN encoding")
                mskip += 1
            br.align()
            br.take_bytes(mskip)
            if islast:
                raise BrotliError("metadata meta-block marked last")
            continue
        mlen = br.bits(16 + 4 * mnibbles) + 1
        if mnibbles > 0 and (mlen - 1) >> (16 + 4 * (mnibbles - 1)) == 0:
            raise BrotliError("non-minimal MLEN encoding")
        if len(out) + mlen > max_output:
            raise BrotliError("output exceeds max_output")
        if not islast and br.bit():           # ISUNCOMPRESSED
            _tick("metablock_raw")
            br.align()
            out += br.take_bytes(mlen)
            continue
        _tick("metablock_compressed")

        nbl = [0, 0, 0]
        type_codes: list = [None, None, None]
        count_codes: list = [None, None, None]
        blocklen = [1 << 28, 1 << 28, 1 << 28]
        btype = [0, 0, 0]
        btype_prev = [1, 1, 1]
        for cat in range(3):
            nbl[cat] = _decode_varlen_u8(br) + 1
            if nbl[cat] > 1:
                _tick("multi_block_types")
                tcode, ccode, first = _read_block_switch_codes(
                    br, nbl[cat])
                type_codes[cat] = tcode
                count_codes[cat] = ccode
                blocklen[cat] = first

        def switch_block(cat):
            sym = type_codes[cat].read(br)
            if sym == 0:
                new = btype_prev[cat]
            elif sym == 1:
                new = (btype[cat] + 1) % nbl[cat]
            else:
                new = sym - 2
            btype_prev[cat] = btype[cat]
            btype[cat] = new
            blocklen[cat] = _read_block_count(br, count_codes[cat])

        npostfix = br.bits(2)
        ndirect = br.bits(4) << npostfix
        dist_alpha = 16 + ndirect + (48 << npostfix)
        ctx_modes = [br.bits(2) for _ in range(nbl[0])]
        ntrees_l = _decode_varlen_u8(br) + 1
        cmap_l = _read_context_map(br, ntrees_l, 64 * nbl[0])
        ntrees_d = _decode_varlen_u8(br) + 1
        cmap_d = _read_context_map(br, ntrees_d, 4 * nbl[2])
        lit_trees = [_read_prefix_code(br, 256)
                     for _ in range(ntrees_l)]
        cmd_trees = [_read_prefix_code(br, 704) for _ in range(nbl[1])]
        dist_trees = [_read_prefix_code(br, dist_alpha)
                      for _ in range(ntrees_d)]

        produced = 0
        while produced < mlen:
            if blocklen[1] == 0:
                switch_block(1)
            blocklen[1] -= 1
            sym = cmd_trees[btype[1]].read(br)
            range_idx = sym >> 6
            implicit = range_idx < 2
            if range_idx >= 2:
                range_idx -= 2
            ins_code = INSERT_RANGE_LUT[range_idx] + ((sym >> 3) & 7)
            cp_code = COPY_RANGE_LUT[range_idx] + (sym & 7)
            insert_len = INSERT_BASE[ins_code] \
                + br.bits(INSERT_BITS[ins_code])
            copy_len = COPY_BASE[cp_code] + br.bits(COPY_BITS[cp_code])

            if produced + insert_len > mlen:
                raise BrotliError("insert length past meta-block end")
            mode_lut = 512 * ctx_modes[btype[0]]
            for _ in range(insert_len):
                if blocklen[0] == 0:
                    switch_block(0)
                blocklen[0] -= 1
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                ctx = CONTEXT_LUT[mode_lut + p1] \
                    | CONTEXT_LUT[mode_lut + 256 + p2]
                tree = lit_trees[cmap_l[64 * btype[0] + ctx]]
                out.append(tree.read(br))
                mode_lut = 512 * ctx_modes[btype[0]]
            produced += insert_len
            if produced == mlen:
                break

            if implicit:
                distance = ring[0]
                dcode = -1
            else:
                if blocklen[2] == 0:
                    switch_block(2)
                blocklen[2] -= 1
                dctx = 3 if copy_len > 4 else copy_len - 2
                tree = dist_trees[cmap_d[4 * btype[2] + dctx]]
                dcode = tree.read(br)
                if dcode < 16:
                    if dcode < 4:
                        distance = ring[dcode]
                    else:
                        distance = _ring_compound(ring, dcode)
                    if distance <= 0:
                        raise BrotliError("non-positive ring distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    ndist = dcode - ndirect - 16
                    postfix_mask = (1 << npostfix) - 1
                    lcode = ndist & postfix_mask
                    hcode = ndist >> npostfix
                    nbits = 1 + (hcode >> 1)
                    offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = ((offset + br.bits(nbits)) << npostfix) \
                        + lcode + ndirect + 1

            max_dist = min(len(out), window)
            if distance <= max_dist:
                if dcode > 0:
                    ring[3] = ring[2]
                    ring[2] = ring[1]
                    ring[1] = ring[0]
                    ring[0] = distance
                if produced + copy_len > mlen:
                    raise BrotliError("copy past meta-block end")
                if distance >= copy_len:
                    start = len(out) - distance
                    out += out[start:start + copy_len]
                else:
                    for _ in range(copy_len):
                        out.append(out[-distance])
                produced += copy_len
            else:                             # static dictionary
                _tick("dictionary")
                if not 4 <= copy_len <= 24:
                    raise BrotliError(
                        f"dictionary copy length {copy_len} invalid")
                word_id = distance - max_dist - 1
                shift = DICT_SIZE_BITS_BY_LENGTH[copy_len]
                index = word_id & ((1 << shift) - 1)
                tid = word_id >> shift
                if tid >= len(TRANSFORMS):
                    raise BrotliError("transform id out of range")
                if tid > 0:
                    _tick("dictionary_transform")
                base_off = DICT_OFFSETS_BY_LENGTH[copy_len] \
                    + index * copy_len
                word = DICTIONARY[base_off:base_off + copy_len]
                expanded = _transform_word(word, tid)
                if produced + len(expanded) > mlen:
                    raise BrotliError("dictionary word past block end")
                out += expanded
                produced += len(expanded)
        if islast:
            break
    # trailing bits after the last meta-block must be zero padding
    br.align()
    return bytes(out)


def _ring_compound(ring, dcode):
    """Distance codes 4..15 (RFC 7932 section 4): last/second-last
    distance plus or minus 1..3."""
    base = ring[0] if dcode < 10 else ring[1]
    k = dcode - 4 if dcode < 10 else dcode - 10
    off = (k >> 1) + 1
    return base - off if k & 1 == 0 else base + off
