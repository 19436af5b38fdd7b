"""Sliding-window chunking — `text.chunk_documents`.

Twin: pure-python windows over the same split(trim, \\s+) token family.
The geometry additionally rides the dedup_exact kind='chunk' oracle rows
(DuckDB range() + list-slice rebuild) at the driver's gate.
"""

import re

import pytest

from amazon_kinesis_replay_spark.operators import text as t
from amazon_kinesis_replay_spark.tables import load


def _py_chunks(s, chunk_tokens, overlap):
    toks = re.split(r"\s+", s.strip(" "))
    step = chunk_tokens - overlap
    out = []
    starts = list(range(0, max(len(toks) - overlap - 1, 0) + 1, step))
    for st in starts:
        win = toks[st:st + chunk_tokens]
        out.append((st // step, st, len(win), " ".join(win)))
    return out


DOCS = [
    (1, "a b c d e f g h i j"),            # 10 tokens, several windows
    (2, "single"),                          # 1 token, one short chunk
    (3, ""),                                # empty -> one ['']-chunk
    (4, "x " * 7),                          # trailing space
    (5, "\tlead and trail\n"),              # tab/newline edges (trim
                                            # strips SPACES only)
]


def test_chunk_documents_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in t.chunk_documents(df, "doc_id", "text",
                               chunk_tokens=4, overlap=1).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_token"], r["n_tokens"],
             r["chunk_text"]))
    for doc_id, s in DOCS:
        assert sorted(got[doc_id]) == _py_chunks(s, 4, 1), f"doc {doc_id}"


def test_chunk_documents_overlap_reassembles(spark, sf_dir):
    """Dropping the first `overlap` tokens of every non-first chunk and
    concatenating reconstructs each document's token stream exactly —
    the lossless-coverage property embedding pipelines rely on."""
    docs = load(spark, sf_dir, "documents").limit(50)
    chunks = t.chunk_documents(docs, "doc_id", "text",
                               chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] != "" else [""]
        prev = by_doc.setdefault(r["doc_id"], [])
        prev.extend(toks[4:] if prev else toks)
    src = {r["doc_id"]: re.split(r"\s+", r["text"].strip(" "))
           for r in docs.select("doc_id", "text").collect()}
    assert by_doc == src


def test_chunk_documents_every_doc_emits(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    covered = (t.chunk_documents(docs, "doc_id", "text")
               .select("doc_id").distinct().count())
    assert covered == n_docs


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for bad in (-1, 8, 9):
        with pytest.raises(ValueError, match="overlap"):
            t.chunk_documents(df, "doc_id", "text",
                              chunk_tokens=8, overlap=bad)


def test_chunk_documents_plan_is_projection_only(spark, sf_dir):
    """No shuffle, no UDF: scan -> generate -> project."""
    docs = load(spark, sf_dir, "documents")
    plan = (t.chunk_documents(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Generate explode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
