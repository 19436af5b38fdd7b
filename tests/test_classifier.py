"""Distributed linear quality classifier (hashing trick + full-batch
logistic GD) vs the driver-only reference twin."""

import pytest

from amazon_kinesis_replay_spark.operators import classifier

_SPAM = [
    "buy cheap pills now best price click here",
    "cheap pills best deal click now buy buy",
    "click here now cheap best pills offer",
    "best cheap offer click pills now here deal",
    "now now cheap pills click best buy offer",
    "deal deal cheap click now pills buy",
]
_HAM = [
    "the committee discussed the annual budget report",
    "rainfall patterns shifted across the northern valley",
    "the museum opened a new exhibit on ceramics",
    "students presented research on coastal erosion",
    "the orchestra rehearsed the second symphony movement",
    "local farmers rotated crops to restore the soil",
]


def _corpus(spark):
    rows = ([(i, t, 1) for i, t in enumerate(_SPAM)]
            + [(100 + i, t, 0) for i, t in enumerate(_HAM)])
    return rows, spark.createDataFrame(
        rows, "doc_id long, text string, label int")


def test_logreg_train_matches_python_reference(spark):
    """The distributed trainer's weights equal the driver-only twin
    (same features via the Spark-matching pure-python xxh64, same
    update rule) up to float-sum ordering."""
    rows, df = _corpus(spark)
    dim, iters = 64, 10
    w_spark = classifier.logreg_train(df, "doc_id", "text", "label",
                                      dim=dim, n_iters=iters)
    w_py = classifier.py_reference_train(
        [(t, y) for _i, t, y in rows], dim=dim, n_iters=iters)
    assert len(w_spark) == dim + 1
    for a, b in zip(w_spark, w_py):
        assert a == pytest.approx(b, abs=1e-9)


def test_logreg_separates_and_is_deterministic(spark):
    rows, df = _corpus(spark)
    w = classifier.logreg_train(df, "doc_id", "text", "label",
                                dim=64, n_iters=20)
    scored = {r["id"]: r["prob"] for r in classifier.logreg_score(
        df, "doc_id", "text", w).collect()}
    spam_min = min(scored[i] for i, _t, y in rows if y == 1)
    ham_max = max(scored[i] for i, _t, y in rows if y == 0)
    assert spam_min > 0.5 > ham_max
    w2 = classifier.logreg_train(df, "doc_id", "text", "label",
                                 dim=64, n_iters=20)
    for a, b in zip(w, w2):
        assert a == pytest.approx(b, abs=1e-12)


def test_hashed_features_match_python_hash(spark):
    """The JVM xxhash64-mod-dim feature indices equal the pure-python
    recompute (the literal-VALUES-gate precondition)."""
    from amazon_kinesis_replay_spark.functions.xxh import xxh64_string
    _rows, df = _corpus(spark)
    dim = 128
    got = {(r["id"], r["idx"]) for r in
           classifier.hashed_features(df, "doc_id", "text", dim).collect()}
    expect = set()
    for i, t, _y in _rows:
        for tok in set(t.strip().lower().split()):
            expect.add((i, xxh64_string(tok) % dim))
    assert got == expect
