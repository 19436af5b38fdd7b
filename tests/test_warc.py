"""WARC ingestion: parse round-trips, malformed-record policy, HTTP
body split, baseline HTML text extraction, streaming twin."""

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.sources import warc

_HTML = (b"<html><head><style>body{color:red}</style>"
         b"<script>var x=1;</script></head>"
         b"<body><h1>Hello &amp; welcome</h1>\n"
         b"<p>plain  text&nbsp;here</p></body></html>")
_HTTP = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
         b"Server: x\r\n\r\n" + _HTML)


def _records():
    return [
        {"warc_type": "warcinfo", "record_id": "<urn:uuid:1>",
         "target_uri": None, "warc_date": "2024-01-01T00:00:00Z",
         "content_type": "application/warc-fields",
         "content": b"software: test\r\n"},
        {"warc_type": "request", "record_id": "<urn:uuid:2>",
         "target_uri": "http://example.com/", "warc_date":
         "2024-01-01T00:00:01Z", "content_type":
         "application/http;msgtype=request",
         "content": b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"},
        {"warc_type": "response", "record_id": "<urn:uuid:3>",
         "target_uri": "http://example.com/", "warc_date":
         "2024-01-01T00:00:02Z", "content_type":
         "application/http;msgtype=response", "content": _HTTP},
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_parse_round_trip(gz):
    blob = warc.write_warc(_records(), gzip_per_record=gz)
    recs, err = warc.parse_warc(blob)
    assert err is None
    assert [r["warc_type"] for r in recs] == \
        ["warcinfo", "request", "response"]
    assert recs[2]["target_uri"] == "http://example.com/"
    assert recs[2]["content"] == _HTTP
    assert recs[2]["content_length"] == len(_HTTP)


def test_parse_malformed_keeps_prefix():
    """Skip-bad-records policy (OP-SRC-SKIPBAD class): a structurally
    broken record ends that file's parse; prior records survive and the
    error is reported, not raised."""
    good = warc.write_warc(_records()[:2], gzip_per_record=False)
    recs, err = warc.parse_warc(good + b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")
    assert len(recs) == 2 and "overruns" in err
    recs2, err2 = warc.parse_warc(good + b"NOT A RECORD\r\n")
    assert len(recs2) == 2 and "version" in err2
    recs3, err3 = warc.parse_warc(b"\x1f\x8bgarbage")
    assert recs3 == [] and err3.startswith("gzip")


def test_read_warc_distributed(spark, tmp_path):
    """read_warc over a directory of per-record-gzip WARCs: one row per
    record, parse_error NULL, content bytes intact; the malformed file
    surfaces its error alongside its parsed prefix."""
    (tmp_path / "a.warc.gz").write_bytes(warc.write_warc(_records()))
    bad = warc.write_warc(_records()[:1], gzip_per_record=False) \
        + b"WARC/1.0\r\nContent-Length: 99\r\n\r\nx"
    (tmp_path / "b.warc").write_bytes(bad)
    got = warc.read_warc(spark, str(tmp_path)).collect()
    a = [r for r in got if r["path"].endswith("a.warc.gz")]
    b = [r for r in got if r["path"].endswith("b.warc")]
    assert len(a) == 3 and all(r["parse_error"] is None for r in a)
    assert bytes([r for r in a if r["warc_type"] == "response"][0]
                 ["content"]) == _HTTP
    assert len(b) == 1 and "overruns" in b[0]["parse_error"]
    assert b[0]["warc_type"] == "warcinfo"


def test_http_body_and_strip_html(spark):
    df = spark.createDataFrame([(1, bytearray(_HTTP)),
                                (2, bytearray(b"no header block"))],
                               "id long, content binary")
    out = df.select(
        "id", warc.http_body(F.col("content")).alias("body")).collect()
    body = {r["id"]: r["body"] for r in out}
    assert body[1] == _HTML.decode()
    assert body[2] == "no header block"
    txt = spark.createDataFrame([(h,) for h in
                                 [_HTML.decode(), "a &lt;b&gt; c", ""]],
                                "t string") \
        .select(warc.strip_html_tags(F.col("t")).alias("s")).collect()
    want = [warc.py_strip_html(h)
            for h in [_HTML.decode(), "a &lt;b&gt; c", ""]]
    assert [r["s"] for r in txt] == want
    assert want[0] == "Hello & welcome plain text here"   # script/style gone


def test_read_warc_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "wsrc"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(warc.write_warc(_records()))
    out = warc.read_warc_stream(spark, str(src)) \
        .select("warc_type", "record_id", "content_length")
    q = (out.writeStream.format("memory").queryName("warc_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["warc_type"], r["record_id"], r["content_length"])
           for r in spark.table("warc_stream").collect()}
    want = {(r["warc_type"], r["record_id"], len(r["content"]))
            for r in warc.read_warc(spark, str(src)).collect()}
    assert got == want and len(got) == 3


def test_warc_feeds_documents_pipeline(spark, tmp_path):
    """Composition witness: crawl records flow straight into the
    documents surface — response → http_body → strip_html_tags →
    text.quality_features, no adapters."""
    from amazon_kinesis_replay_spark.operators import text
    (tmp_path / "c.warc.gz").write_bytes(warc.write_warc(_records()))
    docs = (warc.read_warc(spark, str(tmp_path))
            .filter(F.col("warc_type") == "response")
            .select(F.col("record_id").alias("doc_id"),
                    warc.strip_html_tags(
                        warc.http_body(F.col("content"))).alias("text")))
    qf = text.quality_features(docs, "doc_id", "text").collect()
    assert len(qf) == 1
    assert qf[0]["n_tokens"] > 0


def test_responses_to_documents_content_encodings(spark, tmp_path):
    """r10 verdict item 6 operator: responses_to_documents undoes
    Content-Encoding (identity / gzip / br) in one Arrow kernel, strips
    HTML JVM-side, skips a corrupt encoded body without failing, and
    drops non-response records. Brotli body uses a pure-Python-decoded
    stream compressed by libbrotli when present, else skipped."""
    import ctypes
    import gzip as _gzip

    try:
        E = ctypes.CDLL("libbrotlienc.so.1")
        E.BrotliEncoderCompress.restype = ctypes.c_int
        E.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p]
        E.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        E.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]

        def br(data):
            cap = max(E.BrotliEncoderMaxCompressedSize(len(data)), 64)
            buf = ctypes.create_string_buffer(cap)
            n = ctypes.c_size_t(cap)
            assert E.BrotliEncoderCompress(9, 22, 0, len(data), data,
                                           ctypes.byref(n), buf)
            return buf.raw[:n.value]
    except OSError:
        br = None

    def resp(rid, body, enc=None):
        hdr = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        if enc:
            hdr += b"Content-Encoding: " + enc + b"\r\n"
        return {"warc_type": "response", "record_id": rid,
                "target_uri": "http://example.com/" + rid.strip("<>"),
                "warc_date": "2024-01-01T00:00:00Z",
                "content_type": "application/http;msgtype=response",
                "content": hdr + b"\r\n" + body}

    html = b"<html><body><p>alpha beta  gamma</p></body></html>"
    recs = [
        resp("<a>", html),
        resp("<b>", _gzip.compress(html), b"gzip"),
        resp("<bad>", b"\x1f\x8b\x08\x00garbage", b"gzip"),
        {"warc_type": "request", "record_id": "<req>",
         "target_uri": "http://example.com/", "warc_date":
         "2024-01-01T00:00:00Z", "content_type": "application/http",
         "content": b"GET / HTTP/1.1\r\n\r\n"},
    ]
    if br is not None:
        recs.append(resp("<c>", br(html), b"br"))
    (tmp_path / "enc.warc.gz").write_bytes(warc.write_warc(recs))

    docs = warc.responses_to_documents(
        warc.read_warc(spark, str(tmp_path))).collect()
    got = {r["doc_id"]: r["text"] for r in docs}
    want_ids = {"<a>", "<b>"} | ({"<c>"} if br is not None else set())
    assert set(got) == want_ids            # corrupt + request dropped
    assert all(t == "alpha beta gamma" for t in got.values())
    urls = {r["doc_id"]: r["url"] for r in docs}
    assert urls["<a>"] == "http://example.com/a"


def test_responses_to_documents_streaming(spark, tmp_path):
    """The WARC->documents operator composes onto the STREAMING reader
    unchanged (mapInPandas + column ops are stream-safe): a two-segment
    crawl drains through maxFilesPerTrigger=1 into the same
    (doc_id, url, warc_date, text) surface the batch path yields."""
    (tmp_path / "s0.warc.gz").write_bytes(warc.write_warc(_records()))
    recs2 = _records()
    recs2[2]["record_id"] = "<urn:uuid:9>"
    (tmp_path / "s1.warc.gz").write_bytes(warc.write_warc(recs2))

    docs = warc.responses_to_documents(
        warc.read_warc_stream(spark, str(tmp_path)))
    q = (docs.writeStream.format("memory").queryName("warc_docs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["doc_id"], r["text"])
           for r in spark.table("warc_docs").collect()}
    want = {(r["doc_id"], r["text"])
            for r in warc.responses_to_documents(
                warc.read_warc(spark, str(tmp_path))).collect()}
    assert got == want and len(got) == 2
