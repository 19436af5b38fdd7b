"""WARC -> curate bridge demo (r10 verdict item 6).

Closes the last untested seam between ingestion and curation: a small
Common-Crawl-shaped corpus (per-record-gzip WARC files whose HTTP
payloads use identity, gzip, AND brotli Content-Encoding, interleaved
with request/warcinfo records and one corrupt record) is ingested into
the documents schema with `warc.responses_to_documents`, verified
byte-faithful against the source documents, and run through curate
stages 1-3 (quality+LM scoring, classifier distillation, PII
redaction). Prints per-stage counts as ONE JSON line.

The WARC fixture derives from the sf documents table so text fidelity
is assertable: each doc ships as an HTML page; after ingest + tag
strip the text must equal the original (modulo the documented
whitespace collapse).

Usage: python tools/warc_curate_bridge.py [sf_dir]
"""
from __future__ import annotations

import ctypes
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brotli_compress():
    """libbrotlienc via ctypes (same harness as the codec witness
    tests); None when the library is absent."""
    try:
        E = ctypes.CDLL("libbrotlienc.so.1")
    except OSError:
        return None
    E.BrotliEncoderCompress.restype = ctypes.c_int
    E.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p]
    E.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    E.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]

    def compress(data: bytes, quality: int = 9) -> bytes:
        cap = max(E.BrotliEncoderMaxCompressedSize(len(data)), 64)
        buf = ctypes.create_string_buffer(cap)
        n = ctypes.c_size_t(cap)
        assert E.BrotliEncoderCompress(quality, 22, 0, len(data), data,
                                       ctypes.byref(n), buf)
        return buf.raw[:n.value]

    return compress


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import gzip as _gzip

    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark.operators import classifier, text
    from amazon_kinesis_replay_spark.session import build_spark
    from amazon_kinesis_replay_spark.sources import warc
    from amazon_kinesis_replay_spark.tables import load

    spark = build_spark("warc-curate-bridge")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict = {"sf_dir": sf_dir}

    br = _brotli_compress()
    summary["brotli_available"] = br is not None

    # ---- stage 0: synthesize the crawl --------------------------------
    rows = (load(spark, sf_dir, "documents")
            .select("doc_id", "text").orderBy("doc_id").collect())
    n_docs = len(rows)

    # plant PII in every 50th doc so stage 3's redaction count is a
    # closed-loop assertion (same text lands in the fidelity oracle)
    def doc_text(i, r):
        if i % 50 == 0:
            return r["text"] + " contact admin@example.test today"
        return r["text"]

    n_pii = sum(1 for i in range(n_docs) if i % 50 == 0)

    def record(i, r):
        # no bare text outside <p>: tag-strip keeps element text, so a
        # title would prepend itself; <style> exercises the block strip
        html = ("<html><head><style>b{color:red}</style></head>"
                "<body><p>" + doc_text(i, r) + "</p></body></html>").encode()
        enc = i % 3
        if enc == 1:
            body, enc_hdr = _gzip.compress(html), b"Content-Encoding: gzip\r\n"
        elif enc == 2 and br is not None:
            body, enc_hdr = br(html), b"Content-Encoding: br\r\n"
        else:
            body, enc_hdr = html, b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + enc_hdr + b"\r\n" + body)
        return {"warc_type": "response",
                "record_id": f"<urn:doc:{r['doc_id']}>",
                "target_uri": f"https://example.test/{r['doc_id']}",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "content": http}

    work = tempfile.mkdtemp(prefix="warc-bridge-")
    src = os.path.join(work, "crawl")
    os.makedirs(src)
    n_files = 4
    per = (n_docs + n_files - 1) // n_files
    n_noise = 0
    for k in range(n_files):
        recs = []
        for i, r in enumerate(rows[k * per:(k + 1) * per]):
            if i % 40 == 0:       # interleaved non-response records
                recs.append({"warc_type": "request",
                             "record_id": f"<urn:req:{k}:{i}>",
                             "target_uri": "https://example.test/",
                             "warc_date": "2026-01-01T00:00:00Z",
                             "content_type": "application/http",
                             "content": b"GET / HTTP/1.1\r\n\r\n"})
                n_noise += 1
            recs.append(record(k * per + i, r))
        blob = warc.write_warc(recs, gzip_per_record=True)
        open(os.path.join(src, f"seg-{k:02d}.warc.gz"), "wb").write(blob)
    # one response with a CORRUPT gzip body: must be skipped, not fatal
    bad = {"warc_type": "response", "record_id": "<urn:doc:bad>",
           "target_uri": "https://example.test/bad",
           "warc_date": "2026-01-01T00:00:00Z",
           "content_type": "application/http; msgtype=response",
           "content": (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                       b"\r\n\x1f\x8b\x08\x00garbage")}
    open(os.path.join(src, "seg-bad.warc.gz"), "wb").write(
        warc.write_warc([bad]))
    summary["warc_files"] = n_files + 1

    # ---- stage 0b: ingest ------------------------------------------------
    raw = warc.read_warc(spark, src)
    summary["warc_records"] = raw.count()
    assert summary["warc_records"] == n_docs + n_noise + 1
    docs = warc.responses_to_documents(raw).persist()
    summary["docs_ingested"] = docs.count()
    assert summary["docs_ingested"] == n_docs      # corrupt one skipped

    # fidelity: ingested text == source text (modulo whitespace collapse)
    want = spark.createDataFrame(
        [(f"<urn:doc:{r['doc_id']}>", doc_text(i, r))
         for i, r in enumerate(rows)],
        "doc_id string, want string")
    mismatch = (docs.join(want, "doc_id", "full")
                .filter(F.col("text").isNull() | F.col("want").isNull()
                        | (F.col("text") != F.trim(
                            F.regexp_replace(F.col("want"), r"\s+", " "))))
                .count())
    summary["text_mismatches"] = mismatch
    assert mismatch == 0

    # ---- curate stages 1-3 over the ingested corpus ----------------------
    # 1-2: quality + n-gram LM fit -> combined score
    qf = text.quality_features(docs, "doc_id", "text")
    lm = text.ngram_lm_counts(docs, "text", n=2)
    lmscore = text.ngram_lm_score(docs, "doc_id", "text", lm, n=2)
    quality = (qf.join(lmscore.select("doc_id", "bits_per_token"),
                       "doc_id", "left")
               .select("doc_id",
                       (F.col("quality_score")
                        - F.coalesce(F.col("bits_per_token"), F.lit(0.0))
                        / F.lit(64.0)).alias("score")).persist())
    summary["stage1_scored"] = quality.count()

    # 2b: distill into the linear classifier (weak labels at the median)
    med = quality.approxQuantile("score", [0.5], 0.0)[0]
    lab = docs.join(quality, "doc_id").withColumn(
        "label", (F.col("score") >= F.lit(med)).cast("int"))
    w = classifier.logreg_train(lab, "doc_id", "text", "label", dim=256)
    probs = classifier.logreg_score(docs, "doc_id", "text", w) \
        .select(F.col("id").alias("doc_id"), "prob")
    agree = (probs.join(lab.select("doc_id", "label"), "doc_id")
             .filter((F.col("prob") >= 0.5) == (F.col("label") == 1))
             .count())
    summary["stage2_clf_agreement"] = round(agree / n_docs, 3)

    # 3: PII redaction
    red = text.pii_redact(docs, "doc_id", "text")
    pii = red.agg(F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"),
                  F.sum("n_phones").alias("p"),
                  F.count("*").alias("n")).collect()[0]
    summary["stage3_redacted_docs"] = pii["n"]
    summary["stage3_pii_counts"] = {"emails": int(pii["e"] or 0),
                                    "ips": int(pii["i"] or 0),
                                    "phones": int(pii["p"] or 0)}
    summary["stage3_planted_emails"] = n_pii
    assert pii["n"] == n_docs
    assert int(pii["e"] or 0) == n_pii      # every planted email found

    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
