"""Distributed linear quality classifier (hashing trick + full-batch
logistic GD) vs the driver-only reference twin."""

import pytest
from pyspark.sql import functions as F

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


def test_threshold_keep_frac_calibration(spark):
    """late r8: the calibrated keep-fraction threshold — keep set is AT
    LEAST the target fraction (bucket lower bound only ever keeps more),
    exact on sub-65536-ppm scores, deterministic under repartitioning."""
    from amazon_kinesis_replay_spark.operators import classifier
    n = 1000
    df = spark.range(n).select(
        (F.col("id").cast("double") / n).alias("prob"))
    for frac in (0.5, 0.9, 0.97, 1.0):
        t = classifier.threshold_keep_frac(df, frac)
        kept = df.filter(F.col("prob") >= t).count()
        assert kept >= int(frac * n), (frac, t, kept)
        assert kept <= int(frac * n) + n // 50, (frac, t, kept)  # not lax
    t1 = classifier.threshold_keep_frac(df.repartition(7), 0.9)
    assert t1 == classifier.threshold_keep_frac(df, 0.9)
    import pytest
    with pytest.raises(ValueError, match="keep_frac"):
        classifier.threshold_keep_frac(df, 0.0)


def test_threshold_for_precision_calibration(spark):
    """The precision-calibrated threshold equals a pure-python sweep of
    descending-prob TIE-GROUP prefixes (a keep set prob >= t always
    contains whole tie groups — a per-row prefix could report a
    precision the threshold cannot realize); unreachable targets return
    None. Includes tied probs with mixed labels."""
    from amazon_kinesis_replay_spark.operators import classifier
    rows = [(0.95, 1), (0.9, 1), (0.85, 0), (0.8, 1), (0.8, 0),
            (0.8, 1), (0.7, 1), (0.6, 0), (0.5, 0), (0.4, 1),
            (0.3, 0), (0.2, 0)]
    df = spark.createDataFrame(rows, "prob double, label int")

    def py_threshold(target):
        groups: dict = {}
        for p, y in rows:
            pos, n = groups.get(p, (0, 0))
            groups[p] = (pos + y, n + 1)
        best, cpos, cn = None, 0, 0
        for p in sorted(groups, reverse=True):
            pos, n = groups[p]
            cpos, cn = cpos + pos, cn + n
            if cpos / cn >= target:
                best = p
        return best

    for target in (0.6, 0.75, 0.9, 1.0):
        got = classifier.threshold_for_precision(df, "label", target)
        assert got == py_threshold(target), target
    assert classifier.threshold_for_precision(
        df.filter("label = 0"), "label", 0.5) is None
    # determinism under repartitioning (intra-tie row order must not
    # matter once ties are grouped)
    t1 = classifier.threshold_for_precision(df.repartition(5), "label", 0.75)
    assert t1 == classifier.threshold_for_precision(df, "label", 0.75)


def test_logreg_lbfgs_matches_twin_and_beats_gd(spark):
    """late r8, the ROADMAP L-BFGS upgrade: (a) the distributed trainer
    matches the driver-only twin (looser tolerance than GD — the
    history recursion amplifies Spark's float-sum-order jitter);
    (b) the efficiency claim is MEASURED, not assumed: 10 L-BFGS
    iterations reach a lower training loss than 30 full-batch GD
    passes on the same corpus; (c) rerun-deterministic."""
    import math

    rows, df = _corpus(spark)
    dim, iters = 64, 10
    w_l = classifier.logreg_train_lbfgs(df, "doc_id", "text", "label",
                                        dim=dim, n_iters=iters)
    w_py = classifier.py_reference_lbfgs(
        [(t, y) for _i, t, y in rows], dim=dim, n_iters=iters)
    assert len(w_l) == dim + 1
    for a, b in zip(w_l, w_py):
        assert a == pytest.approx(b, abs=1e-6)

    def py_loss(wv):
        import re
        from amazon_kinesis_replay_spark.functions.xxh import xxh64_string
        tot = 0.0
        for _i, t, y in rows:
            idxs = {xxh64_string(tok) % dim
                    for tok in re.split(r"\s+", t.strip().lower())}
            mg = sum(wv[j] for j in idxs) + wv[dim]
            sp = mg + math.log1p(math.exp(-mg)) if mg > 0 \
                else math.log1p(math.exp(mg))
            tot += sp - y * mg
        return tot / len(rows)

    w_gd = classifier.logreg_train(df, "doc_id", "text", "label",
                                   dim=dim, n_iters=30)
    assert py_loss(w_l) < py_loss(w_gd), (py_loss(w_l), py_loss(w_gd))
    # rerun-deterministic up to float-sum ordering
    w_l2 = classifier.logreg_train_lbfgs(df, "doc_id", "text", "label",
                                         dim=dim, n_iters=iters)
    for a, b in zip(w_l, w_l2):
        assert a == pytest.approx(b, abs=1e-6)
    # the model still separates the classes
    scored = {r["id"]: r["prob"] for r in classifier.logreg_score(
        df, "doc_id", "text", w_l).collect()}
    spam_min = min(scored[i] for i, _t, y in rows if y == 1)
    ham_max = max(scored[i] for i, _t, y in rows if y == 0)
    assert spam_min > 0.5 > ham_max


def test_logreg_minibatch_matches_twin(spark):
    """Hash-bucketed mini-batch GD == the driver-only twin (same xxh64
    bucket assignment via the signed-pmod chain, same cycling schedule,
    same arithmetic) to float-sum tolerance; rerun-deterministic."""
    rows, df = _corpus(spark)
    dim, iters, nb = 64, 12, 3
    w_spark = classifier.logreg_train_minibatch(
        df, "doc_id", "text", "label", dim=dim, n_iters=iters,
        n_buckets=nb, seed=7)
    w_py = classifier.py_reference_minibatch(
        rows, dim=dim, n_iters=iters, n_buckets=nb, seed=7)
    assert len(w_spark) == dim + 1
    for a, b in zip(w_spark, w_py):
        assert a == pytest.approx(b, abs=1e-9)
    w2 = classifier.logreg_train_minibatch(
        df, "doc_id", "text", "label", dim=dim, n_iters=iters,
        n_buckets=nb, seed=7)
    for a, b in zip(w_spark, w2):
        assert a == pytest.approx(b, abs=1e-12)


def test_logreg_minibatch_epoch_tracks_full_batch(spark):
    """One epoch of cycling buckets (n_buckets steps, each ~1/n_buckets
    of the shuffle mass) must actually LEARN: after two epochs the
    model separates the fixture like full-batch GD does."""
    rows, df = _corpus(spark)
    w = classifier.logreg_train_minibatch(
        df, "doc_id", "text", "label", dim=64, n_iters=16, n_buckets=4)
    scored = {r["id"]: r["prob"] for r in classifier.logreg_score(
        df, "doc_id", "text", w).collect()}
    spam_min = min(scored[i] for i, _t, y in rows if y == 1)
    ham_max = max(scored[i] for i, _t, y in rows if y == 0)
    assert spam_min > ham_max            # separation after 4 epochs


def test_twin_tokenizer_whitespace_edges(spark):
    """The trainer twins must use the EXACT Spark tokenizer twin
    (tokens_spark): F.trim strips SPACES only, so a tab/newline-edged
    document keeps a leading empty token that an ad-hoc str.strip()
    twin silently drops (the DSIR-twin review class). Pin GD and
    mini-batch twins on such docs."""
    rows = [(0, "\tbuy cheap pills now\n", 1),
            (1, "click here for the best offer ", 1),
            (2, " the committee\tdiscussed the budget", 0),
            (3, "rainfall shifted across\nthe valley", 0),
            (4, "students presented coastal research", 0),
            (5, "cheap pills click buy now", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w_spark = classifier.logreg_train(df, "doc_id", "text", "label",
                                      dim=32, n_iters=5)
    w_py = classifier.py_reference_train(
        [(t, y) for _i, t, y in rows], dim=32, n_iters=5)
    for a, b in zip(w_spark, w_py):
        assert a == pytest.approx(b, abs=1e-9)
    w_mb = classifier.logreg_train_minibatch(
        df, "doc_id", "text", "label", dim=32, n_iters=6, n_buckets=2)
    w_mb_py = classifier.py_reference_minibatch(
        rows, dim=32, n_iters=6, n_buckets=2)
    for a, b in zip(w_mb, w_mb_py):
        assert a == pytest.approx(b, abs=1e-9)


def test_drop_side_calibrated_junk_gate_on_planted_junk(spark):
    """End-to-end exercise of the curate-2c APPLIED path that the
    synthetic fixture never lets fire (its decile labels always trip
    the volume guard): on a SEPARABLE corpus with planted junk, the
    drop-side precision calibration — threshold_for_precision over
    inverted labels and probs, drop set = prob < (1 - t_inv) — must
    yield a gate that (a) achieves >= 0.8 junk precision against the
    GROUND TRUTH, (b) recalls most planted junk, and (c) keeps enough
    of the corpus that the curate volume guard (>= 80% kept) would
    APPLY it rather than fall back to keep-frac."""
    import random

    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark.operators import classifier

    rng = random.Random(17)
    vocab = ["data", "spark", "query", "join", "scan", "filter",
             "table", "column", "stream", "batch", "merge", "sort"]
    rows = []
    for i in range(300):
        if i % 10 == 0:                      # planted junk: 10%
            junk_tok = rng.choice(["zz", "@@", "..", "xx"])
            text = " ".join([junk_tok] * rng.randrange(3, 30))
            rows.append((i, text, 0))
        else:
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(20, 60)))
            rows.append((i, text, 1))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")

    w = classifier.logreg_train(df, "doc_id", "text", "label", dim=256)
    probs = classifier.logreg_score(df.select("doc_id", "text"),
                                    "doc_id", "text", w) \
        .select(F.col("id").alias("doc_id"), "prob")
    val = probs.join(df.select("doc_id", "label"), "doc_id")

    t_inv = classifier.threshold_for_precision(
        val.select((1.0 - F.col("prob")).alias("prob"),
                   (1 - F.col("label")).alias("label")),
        "label", min_precision=0.8)
    assert t_inv is not None
    thr = 1.0 - t_inv

    m = (val.agg(
        F.sum(((F.col("prob") < thr) & (F.col("label") == 0))
              .cast("long")).alias("tp"),
        F.sum((F.col("prob") < thr).cast("long")).alias("dropped"),
        F.sum((F.col("label") == 0).cast("long")).alias("junk"),
        F.count("*").alias("n")).head())
    assert m["dropped"] > 0
    junk_precision = m["tp"] / m["dropped"]
    junk_recall = m["tp"] / m["junk"]
    kept_frac = (m["n"] - m["dropped"]) / m["n"]
    assert junk_precision >= 0.8, junk_precision
    assert junk_recall >= 0.7, junk_recall
    # volume-safe: the curate guard (kept >= 0.8 * docs_in) would APPLY
    # this threshold on a separable corpus with 10% junk
    assert kept_frac >= 0.8, kept_frac


def test_threshold_margin_midpoint(spark):
    """Max-margin gate threshold: logit midpoint of a separated labeled
    validation set (python-twin exact); None on overlap or a missing
    class. Motivation (r11): on a separated val set the prefix-
    precision rule returns the gap's aggressive edge — every threshold
    inside the gap scores identically on the labels, so the midpoint is
    the principled conservative pick."""
    import math

    from amazon_kinesis_replay_spark.operators.classifier import (
        threshold_margin_midpoint)

    rows = [(1, 0.0001, 0), (2, 0.002, 0), (3, 0.97, 1), (4, 0.999, 1)]
    df = spark.createDataFrame(rows, "doc_id long, prob double, label int")
    got = threshold_margin_midpoint(df, "label")

    def logit(p):
        return math.log(p / (1 - p))
    want = 1 / (1 + math.exp(-(logit(0.002) + logit(0.97)) / 2))
    assert got is not None and abs(got - want) < 1e-12
    assert 0.002 < got < 0.97            # strictly inside the gap

    # overlap: max(neg) >= min(pos) -> None
    df2 = spark.createDataFrame(
        [(1, 0.4, 0), (2, 0.3, 1)], "doc_id long, prob double, label int")
    assert threshold_margin_midpoint(df2, "label") is None
    # a single class -> None
    df3 = spark.createDataFrame(
        [(1, 0.4, 0)], "doc_id long, prob double, label int")
    assert threshold_margin_midpoint(df3, "label") is None
    # saturated probs stay finite via the eps clamp
    df4 = spark.createDataFrame(
        [(1, 0.0, 0), (2, 1.0, 1)], "doc_id long, prob double, label int")
    mid = threshold_margin_midpoint(df4, "label")
    # 1e-5 tolerance: 1-(1-eps) reconstructs eps with float error, so
    # the clamped logits are asymmetric by ~1e-7 in log-odds
    assert mid is not None and abs(mid - 0.5) < 1e-5
