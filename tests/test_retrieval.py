"""BM25 keyword retrieval + RRF hybrid fusion vs driver-only twins."""

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.operators import retrieval
from amazon_kinesis_replay_spark.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def doc_rows(docs):
    return [(r["doc_id"], r["text"]) for r in docs.collect()]


def test_postings_tf_sums_to_doclen(spark, docs):
    """Invariant: Σ tf per doc == dl (postings and doc_lengths agree on
    the tokenizer, including empty-token edges)."""
    post = retrieval.postings(docs)
    dl = retrieval.doc_lengths(docs)
    bad = (post.groupBy("id").agg(F.sum("tf").alias("s"))
           .join(dl, "id")
           .filter(F.col("s") != F.col("dl")).count())
    assert bad == 0


def test_bm25_matches_python_twin(spark, docs, doc_rows):
    """Top-k ids AND scores equal the driver twin (same tokenizer twin,
    same Okapi arithmetic) at float-sum tolerance."""
    # build a query from words that actually occur in the fixture
    words = doc_rows[0][1].split()[:3]
    query = " ".join(words)
    got = retrieval.bm25_topk(docs, query, k=10).collect()
    want = retrieval.py_reference_bm25(doc_rows, query, k=10)
    assert [r["id"] for r in got] == [i for i, _s in want]
    for r, (_i, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_bm25_duplicate_query_terms_weighted(spark):
    """Bag semantics: a term repeated in the query counts twice — in
    BOTH the Spark plan (qw weight) and the twin."""
    rows = [(0, "apple banana cherry"),
            (1, "apple apple banana"),
            (2, "cherry date fig")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = retrieval.bm25_topk(df, "apple", k=3).collect()
    two = retrieval.bm25_topk(df, "apple apple", k=3).collect()
    assert [r["id"] for r in one] == [r["id"] for r in two]
    for a, b in zip(one, two):
        assert b["score"] == pytest.approx(2 * a["score"], abs=1e-9)
    want = retrieval.py_reference_bm25(rows, "apple apple", k=3)
    for r, (i, s) in zip(two, want):
        assert r["id"] == i and r["score"] == pytest.approx(s, abs=1e-9)


def test_bm25_empty_query_refused(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty query"):
        retrieval.bm25_topk(df, "   ")


def test_bm25_plan_shape(spark, docs):
    """The query-term and df joins broadcast (the corpus side never
    shuffles for the lookup) and the top-k is TakeOrderedAndProject,
    not a global sort materialization."""
    plan = retrieval.bm25_topk(docs, "the data model", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_rrf_fusion_matches_twin(spark):
    """Fused order == the reciprocal-rank twin; legs with incomparable
    score scales fuse by position only; ids on more legs win ties."""
    leg1 = spark.createDataFrame(
        [(10, 9.5), (11, 7.2), (12, 3.3)], "id long, score double")
    leg2 = spark.createDataFrame(
        [(12, 0.99), (10, 0.98), (13, 0.42)], "id long, score double")
    got = retrieval.rrf_fuse([leg1, leg2]).collect()
    want = retrieval.py_reference_rrf([[10, 11, 12], [12, 10, 13]])
    assert [r["id"] for r in got] == [i for i, _s, _c in want]
    for r, (_i, s, c) in zip(got, want):
        assert r["rrf"] == pytest.approx(s, abs=1e-12)
        assert r["n_legs"] == c
    # doc 10 (ranks 1+2) beats doc 12 (ranks 3+1): position sum wins
    assert got[0]["id"] == 10


def test_hybrid_bm25_plus_cosine_leg(spark, docs, doc_rows):
    """End-to-end hybrid: a BM25 leg fused with a (synthetic) cosine
    leg promotes a doc that is mid-ranked on both over docs that are
    top-of-one / absent-from-the-other tail."""
    words = doc_rows[1][1].split()[:2]
    bm = retrieval.bm25_topk(docs, " ".join(words), k=5)
    ids = [r["id"] for r in bm.collect()]
    assert ids, "fixture sanity: query must match something"
    # synthetic ANN leg: reverse of the bm25 order plus one new id
    cos_rows = [(i, 1.0 - 0.01 * r) for r, i in enumerate(reversed(ids))]
    cos_rows.append((999_999, 0.5))
    ann = spark.createDataFrame(cos_rows, "id long, score double") \
        .orderBy(F.col("score").desc())
    fused = retrieval.rrf_fuse([bm, ann], k=3).collect()
    want = retrieval.py_reference_rrf(
        [ids, [i for i, _ in sorted(cos_rows, key=lambda x: (-x[1], x[0]))]])
    assert [r["id"] for r in fused] == [i for i, _s, _c in want[:3]]


# -- persisted index -------------------------------------------------------

def test_indexed_bm25_matches_direct_and_prunes(spark, docs, doc_rows,
                                                tmp_path):
    """bm25_topk_indexed over the persisted index == bm25_topk over the
    corpus (ids and scores), and the postings scan carries
    PartitionFilters on tb — the query lists only its terms' buckets."""
    from amazon_kinesis_replay_spark.functions.xxh import xxh64_string
    idx = str(tmp_path / "ridx")
    retrieval.retrieval_index_write(docs, idx, n_term_buckets=16)
    words = doc_rows[2][1].split()[:3]
    query = " ".join(words)
    direct = retrieval.bm25_topk(docs, query, k=10).collect()
    indexed = retrieval.bm25_topk_indexed(spark, idx, query, k=10)
    # file-listing pruning: the scan carries PartitionFilters on tb
    # (the IVF-index plan-assertion pattern; DataFrame.inputFiles would
    # list the UNpruned FileIndex and prove nothing)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "tb" in plan.split("PartitionFilters: [", 1)[1][:200]
    # and the filter names exactly the query terms' buckets
    want_tb = {xxh64_string(t.lower()) % 16 for t in words}
    pf = plan.split("PartitionFilters: [", 1)[1][:200]
    for b in want_tb:
        assert str(b) in pf
    got = indexed.collect()
    assert [r["id"] for r in got] == [r["id"] for r in direct]
    for a, b in zip(got, direct):
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)


def test_indexed_append_folds_batches(spark, docs, tmp_path):
    """Incremental contract: base + appended delta == one index built
    over the union (scores from the indexed query are identical), and a
    REPLAYED append (same batch_id) is idempotent."""
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    retrieval.retrieval_index_write(a, inc, n_term_buckets=8)
    retrieval.retrieval_index_append(b, inc, batch_id=1)
    retrieval.retrieval_index_append(b, inc, batch_id=1)   # replay
    retrieval.retrieval_index_write(docs, full, n_term_buckets=8)
    q = "the and of"
    got = retrieval.bm25_topk_indexed(spark, inc, q, k=10).collect()
    want = retrieval.bm25_topk_indexed(spark, full, q, k=10).collect()
    assert [r["id"] for r in got] == [r["id"] for r in want]
    for x, y in zip(got, want):
        assert x["score"] == pytest.approx(y["score"], abs=1e-9)
    with pytest.raises(ValueError, match="batch_id"):
        retrieval.retrieval_index_append(b, inc, batch_id=0)


def test_bm25_batch_matches_per_query(spark, docs, doc_rows, tmp_path):
    """One-pass multi-query scoring == per-query indexed results for
    every query (ids, scores, ranks), via a window partitioned by
    query — never a global sort."""
    idx = str(tmp_path / "bidx")
    retrieval.retrieval_index_write(docs, idx, n_term_buckets=16)
    queries = {
        "q0": " ".join(doc_rows[0][1].split()[:3]),
        "q1": " ".join(doc_rows[5][1].split()[:4]),
        "q2": " ".join(doc_rows[9][1].split()[:2]),
    }
    batch = retrieval.bm25_topk_batch(spark, idx, queries, k=7)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"]))
    for qid, q in queries.items():
        want = retrieval.bm25_topk_indexed(spark, idx, q, k=7).collect()
        mine = sorted(got.get(qid, []))
        assert [i for _r, i, _s in mine] == [r["id"] for r in want]
        for (_r, _i, s), w in zip(mine, want):
            assert s == pytest.approx(w["score"], abs=1e-9)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan     # still prunes the union
    with pytest.raises(ValueError, match="empty query"):
        retrieval.bm25_topk_batch(spark, idx, {"bad": "  "})
    with pytest.raises(ValueError, match="no queries"):
        retrieval.bm25_topk_batch(spark, idx, {})


def test_index_compact_generation_publish(spark, docs, tmp_path):
    """Compaction folds delta slices into one base under a committed
    generation: queries identical before/after, legacy root slices
    swept, a REPLAYED append of a folded batch_id no-ops (the folded
    watermark), a NEW append lands in the generation, a crashed-build
    husk (uncommitted gen) is invisible to readers and swept by the
    next compact, and a second compact carries the watermark forward."""
    from amazon_kinesis_replay_spark import fsutil
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "cidx")
    retrieval.retrieval_index_write(a, idx, n_term_buckets=8)
    retrieval.retrieval_index_append(b, idx, batch_id=1)
    q = "the of and"
    before = retrieval.bm25_topk_indexed(spark, idx, q, k=10).collect()

    # plant a crashed-build husk: an uncommitted generation directory
    fsutil.write_text(spark, idx + "/gen=0000000042/partial.txt", "x\n")
    husk = retrieval.bm25_topk_indexed(spark, idx, q, k=10).collect()
    assert [(r["id"], r["score"]) for r in husk] == \
        [(r["id"], r["score"]) for r in before]   # readers ignore husks

    folded = retrieval.retrieval_index_compact(spark, idx)
    assert folded == 2
    assert not fsutil.exists(spark, idx + "/gen=0000000042")  # husk swept
    assert not fsutil.exists(spark, idx + "/postings")        # migrated
    after = retrieval.bm25_topk_indexed(spark, idx, q, k=10).collect()
    assert [(r["id"], r["score"]) for r in after] == \
        [(r["id"], r["score"]) for r in before]

    base = fsutil.gen_resolve(spark, idx)
    n_post = spark.read.parquet(base + "/postings").count()
    retrieval.retrieval_index_append(b, idx, batch_id=1)       # replay
    assert spark.read.parquet(base + "/postings").count() == n_post

    retrieval.retrieval_index_append(c, idx, batch_id=2)       # new batch
    got = retrieval.bm25_topk_indexed(spark, idx, q, k=10).collect()
    full = str(tmp_path / "cfull")
    retrieval.retrieval_index_write(docs, full, n_term_buckets=8)
    want = retrieval.bm25_topk_indexed(spark, full, q, k=10).collect()
    assert [r["id"] for r in got] == [r["id"] for r in want]
    for x, y in zip(got, want):
        assert x["score"] == pytest.approx(y["score"], abs=1e-9)

    assert retrieval.retrieval_index_compact(spark, idx) == 2  # 0 + 2
    wm = fsutil.read_text(
        spark, fsutil.gen_resolve(spark, idx) + "/folded_max.txt")
    assert int(wm.strip()) == 2                  # watermark carried
    retrieval.retrieval_index_append(c, idx, batch_id=2)       # replay
    got2 = retrieval.bm25_topk_indexed(spark, idx, q, k=10).collect()
    assert [(r["id"], r["score"]) for r in got2] == \
        [(r["id"], r["score"]) for r in got]
    assert retrieval.retrieval_index_compact(spark, idx) == 0  # no deltas


def test_hybrid_topk_end_to_end(spark, docs, doc_rows, sf_dir):
    """hybrid_topk == manual RRF of its two legs (BM25 over documents +
    exact cosine over embeddings, same id space), pinned against the
    python fusion twin."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qvec = emb.orderBy("vec_id").head()["embedding"]
    words = doc_rows[3][1].split()[:3]
    qtext = " ".join(words)
    got = retrieval.hybrid_topk(docs, emb, qtext, qvec, k=5).collect()

    bm_ids = [r["id"] for r in
              retrieval.bm25_topk(docs, qtext, k=10).collect()]
    from amazon_kinesis_replay_spark.operators.similarity import (
        brute_force_topk)
    q_df = spark.createDataFrame([([float(x) for x in qvec],)],
                                 "q_vec array<double>")
    ann_ids = [r["vec_id"] for r in
               brute_force_topk(emb, q_df, k=10).collect()]
    want = retrieval.py_reference_rrf([bm_ids, ann_ids])[:5]
    assert [r["id"] for r in got] == [i for i, _s, _c in want]
    for r, (_i, s, c) in zip(got, want):
        assert r["rrf"] == pytest.approx(s, abs=1e-12)
        assert r["n_legs"] == c
    # the top fused id should sit on BOTH legs on this fixture if any
    # id overlaps; otherwise fusion falls back to leg order — either
    # way the twin equality above is the contract
