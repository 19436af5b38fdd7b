"""Deterministic mixture sampling + DSIR importance resampling."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.operators import sampling, text
from amazon_kinesis_replay_spark.tables import load

_M = 2246822519
_PPM = 1_000_000


def _py_rates(dom_counts, weights, target_frac=0.5):
    """Independent recompute of temperature_mixture_rates at T=2."""
    from decimal import Decimal
    s = {d: math.sqrt(float(weights[d] * n)) for d, n in dom_counts.items()}
    stot = float(sum(Decimal(f"{v:.12f}").quantize(Decimal("1e-12"))
                     for v in s.values()))
    ntot = float(sum(dom_counts.values()))
    out = {}
    for d, n in dom_counts.items():
        rate = min(1.0, (target_frac * ntot) * (s[d] / stot) / float(n))
        out[d] = int(math.floor(rate * _PPM))
    return out


def test_mixture_rates_match_python(spark):
    rows = ([("a", i) for i in range(40)] + [("b", i + 100) for i in range(10)]
            + [("c", i + 200) for i in range(50)])
    df = spark.createDataFrame(
        [(d, i) for d, i in rows], "dom string, id long")
    w = {"a": 1, "b": 4, "c": 2}
    rates = {r["dom"]: r["rate_ppm"]
             for r in sampling.temperature_mixture_rates(
                 df, "dom",
                 weight=lambda c: F.when(c == "a", 1)
                 .when(c == "b", 4).otherwise(2)).collect()}
    expect = _py_rates(Counter(d for d, _ in rows), w)
    assert rates == expect


def test_mixture_sample_verdicts_exact(spark):
    rows = [("a", i) for i in range(30)] + [("b", i + 50) for i in range(20)]
    df = spark.createDataFrame(rows, "dom string, id long")
    out = sampling.mixture_sample(df, "id", "dom")
    got = {r["id"]: (r["mix_rate_ppm"], r["mix_kept"])
           for r in out.collect()}
    rates = _py_rates(Counter(d for d, _ in rows), {"a": 1, "b": 1})
    assert len(got) == 50
    for d, i in rows:
        ppm, kept = got[i]
        assert ppm == rates[d]
        assert kept == ((i * _M) % _PPM < ppm)


def test_hash_ppm_large_ids_no_ansi_overflow(spark):
    """r8 advice item: the bare id*mult product overflows a long (ANSI
    exception) for ids >= ~4.1e9 — exactly a 100 TB corpus's id space.
    The double-pmod form must (a) not raise for any long id and (b) equal
    the true modular product (python bigint recompute)."""
    ids = [0, 1, 4_100_000_000, 2**40 + 7, 2**62 + 12345,
           9_223_372_036_854_775_807]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["ppm"] for r in
           df.select("id", sampling.hash_ppm(F.col("id")).alias("ppm"))
           .collect()}
    for i in ids:
        assert got[i] == (i * _M) % _PPM, i


def test_deterministic_sample_is_stable(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in
         sampling.deterministic_sample(d, "doc_id", 0.3)
         .select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sampling.deterministic_sample(d, "doc_id", 0.3)
         .select("doc_id").collect()}
    assert a == b
    n = d.count()
    assert 0.2 * n < len(a) < 0.4 * n
    # monotone in rate: every 30% member is a 50% member
    c = {r["doc_id"] for r in
         sampling.deterministic_sample(d, "doc_id", 0.5)
         .select("doc_id").collect()}
    assert a <= c


def _tiny_corpus(spark):
    return spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "the dog sat on the rug"),
         (2, "a completely different sentence here now"),
         (3, "the cat sat"),
         (4, "xy")],                       # shorter than n=2 -> NULL path
        "doc_id long, text string")


def _py_bigram_counts(rows):
    cnt = Counter()
    for _i, t in rows:
        w = t.strip().lower().split()
        for j in range(len(w) - 1):
            cnt[(w[j], w[j + 1])] += 1
    return cnt


def test_dsir_stats_match_python(spark):
    df = _tiny_corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    target = [x for x in rows if x[0] % 2 == 0]
    t_cnt, r_cnt = _py_bigram_counts(target), _py_bigram_counts(rows)
    t_lm = text.ngram_lm_counts(df.filter(F.col("doc_id") % 2 == 0),
                                "text", n=2)
    r_lm = text.ngram_lm_counts(df, "text", n=2)
    got = {r["doc_id"]: r for r in sampling.dsir_stats(
        df, "doc_id", "text", t_lm, r_lm, n=2).collect()}
    for did, t in rows:
        w = t.strip().lower().split()
        grams = [(w[j], w[j + 1]) for j in range(len(w) - 1)]
        assert got[did]["n_grams"] == len(grams)
        assert got[did]["t_seen"] == sum(1 for g in grams if g in t_cnt)
        assert got[did]["t_sum"] == sum(t_cnt.get(g, 0) for g in grams)
        assert got[did]["r_seen"] == sum(1 for g in grams if g in r_cnt)
        assert got[did]["r_sum"] == sum(r_cnt.get(g, 0) for g in grams)


def test_dsir_log_weights_match_python(spark):
    df = _tiny_corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    target = [x for x in rows if x[0] % 2 == 0]
    t_cnt, r_cnt = _py_bigram_counts(target), _py_bigram_counts(rows)
    t_ctx = Counter()
    for (c, _t), n in t_cnt.items():
        t_ctx[c] += n
    r_ctx = Counter()
    for (c, _t), n in r_cnt.items():
        r_ctx[c] += n
    v_t = len({t for _c, t in t_cnt})
    v_r = len({t for _c, t in r_cnt})
    k = 0.5
    t_lm = text.ngram_lm_counts(df.filter(F.col("doc_id") % 2 == 0),
                                "text", n=2)
    r_lm = text.ngram_lm_counts(df, "text", n=2)
    got = {r["doc_id"]: r for r in sampling.dsir_log_weights(
        df, "doc_id", "text", t_lm, r_lm, n=2, k=k).collect()}
    for did, t in rows:
        w = t.strip().lower().split()
        grams = [(w[j], w[j + 1]) for j in range(len(w) - 1)]
        if not grams:
            assert got[did]["log_w"] is None
            continue
        lw = 0.0
        for g in grams:
            lp_t = (math.log(t_cnt.get(g, 0) + k)
                    - math.log(t_ctx.get(g[0], 0) + k * v_t))
            lp_r = (math.log(r_cnt.get(g, 0) + k)
                    - math.log(r_ctx.get(g[0], 0) + k * v_r))
            lw += lp_t - lp_r
        assert got[did]["log_w"] == pytest.approx(lw, abs=1e-9)


def test_dsir_sample_gumbel_topk(spark):
    df = _tiny_corpus(spark)
    t_lm = text.ngram_lm_counts(df.filter(F.col("doc_id") % 2 == 0),
                                "text", n=2)
    r_lm = text.ngram_lm_counts(df, "text", n=2)
    wts = sampling.dsir_log_weights(df, "doc_id", "text", t_lm, r_lm, n=2)
    picked = sampling.dsir_sample(wts, "doc_id", k=2)
    rows = {r["doc_id"]: r for r in wts.collect()}
    keys = {}
    for did, r in rows.items():
        if r["log_w"] is None:
            continue
        u = ((did * _M) % _PPM + 0.5) / _PPM
        keys[did] = r["log_w"] + (-math.log(-math.log(u)))
    expect = sorted(keys, key=lambda d: (-keys[d], d))[:2]
    got = [r["doc_id"] for r in picked.collect()]
    assert got == expect
    # rerun-stable
    assert [r["doc_id"] for r in
            sampling.dsir_sample(wts, "doc_id", k=2).collect()] == expect


def test_mixture_fractional_weights_and_null_domain(spark):
    """Review-fix pins: a weight in (0,1) scales the share instead of
    silently zeroing the domain, and NULL-domain rows survive the
    rates join as their own domain."""
    rows = ([("a", i) for i in range(40)]
            + [("b", i + 100) for i in range(40)]
            + [(None, i + 200) for i in range(20)])
    df = spark.createDataFrame(rows, "dom string, id long")
    out = sampling.mixture_sample(
        df, "id", "dom",
        weight=lambda c: F.when(c == "a", 0.25).otherwise(F.lit(1.0)))
    got = {r["id"]: (r["dom"], r["mix_rate_ppm"]) for r in out.collect()}
    assert len(got) == 100                      # NULL-domain rows kept
    rate_a = got[0][1]
    rate_b = got[100][1]
    assert 0 < rate_a < rate_b                  # 0.25 weight: smaller, not 0
    # expected ratio sqrt(0.25*40)/sqrt(1*40) = 0.5 (same n per domain)
    assert abs(rate_a / rate_b - 0.5) < 0.01
    assert got[200][0] is None                  # null domain, own rate


def test_cms_salt_rows_are_independent(spark):
    """Review-fix pin: with string-concat salting, (row=1, '2x') and
    (row=12, 'x') hashed identically once d > 10; the multi-column
    hash must give them different buckets (for these specific values)."""
    from amazon_kinesis_replay_spark.operators import sketches
    df = spark.createDataFrame([("2x",), ("x",)], "v string")
    cells = {(r["row"], r["bucket"]) for r in
             sketches.cms_table(df, "v", w=1 << 20, d=13).collect()}
    # reconstruct the two previously-colliding cells
    by_row = {}
    for row, bucket in cells:
        by_row.setdefault(row, set()).add(bucket)
    # '2x' at row 1 and 'x' at row 12 must occupy DISTINCT cells now:
    # with the old concat they were guaranteed equal
    probe = sketches.cms_lookup(
        sketches.cms_table(df.filter(F.col("v") == "2x"), "v",
                           w=1 << 20, d=13),
        df.filter(F.col("v") == "x"), "v", w=1 << 20, d=13)
    assert probe.head()["est_count"] == 0       # no cross-contamination


def _py_hb_buckets(t, m):
    """Twin of sampling._hashed_gram_buckets: tokens = split(trim(lower)),
    trim strips SPACES only (both engines); bucket = signed pmod."""
    import re
    from amazon_kinesis_replay_spark.functions.xxh import xxh64_string
    ws = re.split(r"\s+", t.lower().strip(" "))
    grams = list(ws) + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
    out = []
    for g in grams:
        v = xxh64_string(g) & ((1 << 64) - 1)
        if v >= 1 << 63:
            v -= 1 << 64
        out.append(v % m)
    return out


def test_dsir_hashed_buckets_match_python(spark):
    """late r8: the paper's hashed uni+bigram feature map — every
    (id, bucket, cnt) cell recomputed pure-python via the xxh64 twin
    with SIGNED-pmod semantics (m deliberately non-power-of-2 so an
    unsigned % would diverge); whitespace edge cases included. Model
    merge is cell-wise additive (batch build == full build)."""
    M = 97
    docs = [(0, "the cat sat on the mat"), (1, "a dog  ran"),
            (2, "single"), (3, "\tleading and trailing\n"),
            (4, "the cat ran fast today")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_id"], r["bucket"]): r["cnt"] for r in
           sampling.dsir_hashed_counts(df, "text", n_buckets=M,
                                       id_col="doc_id").collect()}
    want = {}
    for did, t in docs:
        for b in _py_hb_buckets(t, M):
            want[(did, b)] = want.get((did, b), 0) + 1
    assert got == want
    # corpus model: batch merge == full build cell-for-cell
    full = {(r["bucket"], r["cnt"]) for r in
            sampling.dsir_hashed_counts(df, "text", n_buckets=M).collect()}
    b1 = sampling.dsir_hashed_counts(
        df.filter(F.col("doc_id") < 2), "text", n_buckets=M)
    b2 = sampling.dsir_hashed_counts(
        df.filter(F.col("doc_id") >= 2), "text", n_buckets=M)
    merged = (b1.unionByName(b2).groupBy("bucket")
              .agg(F.sum("cnt").cast("long").alias("cnt")))
    assert {(r["bucket"], r["cnt"]) for r in merged.collect()} == full


def test_dsir_hashed_stats_and_log_weights_match_python(spark):
    """The exact-integer sufficient statistics (the doc_pii_redact gate
    columns) and the smoothed log-weights both match an independent
    python recompute; short/empty-gram docs surface as zeros/NULL."""
    M = 211
    docs = [(i, t) for i, t in enumerate(
        ["the cat sat on the mat", "a dog ran", "single token run",
         "the mat sat", "cat and dog and cat", "zz yy xx"])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    target = sampling.dsir_hashed_counts(
        df.filter(F.col("doc_id") % 2 == 0), "text", n_buckets=M)
    raw = sampling.dsir_hashed_counts(df, "text", n_buckets=M)
    tmod, rmod = {}, {}
    for did, t in docs:
        for b in _py_hb_buckets(t, M):
            rmod[b] = rmod.get(b, 0) + 1
            if did % 2 == 0:
                tmod[b] = tmod.get(b, 0) + 1
    st = {r["doc_id"]: (r["hb_grams"], r["hb_t_sum"], r["hb_r_sum"])
          for r in sampling.dsir_hashed_stats(
              df, "doc_id", "text", target, raw, n_buckets=M).collect()}
    for did, t in docs:
        c = Counter(_py_hb_buckets(t, M))
        assert st[did] == (
            sum(c.values()),
            sum(n * tmod.get(b, 0) for b, n in c.items()),
            sum(n * rmod.get(b, 0) for b, n in c.items())), did
    lw = {r["doc_id"]: r["log_w"] for r in
          sampling.dsir_hashed_log_weights(
              df, "doc_id", "text", target, raw, n_buckets=M).collect()}
    T, R, k = sum(tmod.values()), sum(rmod.values()), 0.5
    for did, t in docs:
        c = Counter(_py_hb_buckets(t, M))
        w = sum(n * (math.log(tmod.get(b, 0) + k) - math.log(T + k * M)
                     - math.log(rmod.get(b, 0) + k) + math.log(R + k * M))
                for b, n in c.items())
        assert abs(lw[did] - w) < 1e-9, did
    # a doc whose target-likeness is higher ranks higher in the sample
    sampled = sampling.dsir_sample(
        sampling.dsir_hashed_log_weights(df, "doc_id", "text", target,
                                         raw, n_buckets=M),
        "doc_id", k=3, log_w_col="log_w")
    assert sampled.count() == 3


def test_dsir_sample_clip_log_w(spark):
    """Importance-weight clipping: an extreme-weight outlier dominates
    the unclipped draw; with the cap it competes on Gumbel noise like
    everything at the ceiling — python twin of the clipped keys."""
    rows = [(i, float(w)) for i, w in
            enumerate([100.0, 0.5, 0.4, 0.3, 0.2, 0.1, 0.0, -0.1])]
    df = spark.createDataFrame(rows, "doc_id long, log_w double")
    top_unclipped = [r["doc_id"] for r in
                     sampling.dsir_sample(df, "doc_id", k=3).collect()]
    assert top_unclipped[0] == 0                     # outlier dominates

    # twin recomputes hash_ppm via the same double-pmod identity
    from amazon_kinesis_replay_spark.operators.sampling import _PPM
    def py_hash_ppm(i):
        return (i % _PPM) * 2246822519 % _PPM
    def py_top(clip):
        keyed = []
        for i, w in rows:
            u = (py_hash_ppm(i) + 0.5) / _PPM
            g = -math.log(-math.log(u))
            keyed.append((min(w, clip), g, i))
        keyed.sort(key=lambda t: (-(t[0] + t[1]), t[2]))
        return [i for _w, _g, i in keyed[:3]]

    got = [r["doc_id"] for r in
           sampling.dsir_sample(df, "doc_id", k=3,
                                clip_log_w=0.45).collect()]
    assert got == py_top(0.45)
    # clip=None is byte-identical to the original behavior
    again = [r["doc_id"] for r in
             sampling.dsir_sample(df, "doc_id", k=3,
                                  clip_log_w=None).collect()]
    assert again == top_unclipped


def test_perplexity_buckets_and_sample(spark, sf_dir):
    """late r8, CCNet head/middle/tail: cut points equal the exact
    order-statistic values (milli-bits < 65536 are in the sketch's
    exact range), every scored doc lands in the right tercile, NULL
    scores keep a NULL bucket, and the sampling verdict is the
    deterministic hash_ppm twin."""
    from amazon_kinesis_replay_spark.operators import text as _text
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    lm = _text.ngram_lm_counts(docs.filter("doc_id % 2 = 0"), "text", n=2)
    scores = _text.ngram_lm_score(docs, "doc_id", "text", lm, n=2)
    out = {r["doc_id"]: (r["bits"], r["ppl_bucket"]) for r in
           sampling.perplexity_buckets(scores, "doc_id").collect()}
    vals = sorted(int(b * 1000) for b, _ in out.values() if b is not None)
    n = len(vals)
    t1 = vals[max(math.ceil(n / 3.0), 1) - 1]
    t2 = vals[max(math.ceil(2.0 * n / 3.0), 1) - 1]
    for did, (bits, bucket) in out.items():
        if bits is None:
            assert bucket is None
            continue
        mb = int(bits * 1000)
        want = "head" if mb < t1 else "middle" if mb < t2 else "tail"
        assert bucket == want, (did, mb, t1, t2, bucket)
    assert {b for _, b in out.values() if b} == {"head", "middle", "tail"}
    # sampling: per-bucket rates + deterministic verdicts
    samp = {r["doc_id"]: (r["ppl_bucket"], r["ppl_rate_ppm"], r["ppl_kept"])
            for r in sampling.perplexity_bucket_sample(
                scores, "doc_id").collect()}
    rates = {"head": 1_000_000, "middle": 500_000, "tail": 100_000}
    for did, (bucket, ppm, kept) in samp.items():
        assert ppm == (rates[bucket] if bucket else 0)
        py_kept = ((did % 1_000_000) * 2246822519 % 1_000_000) < ppm
        assert kept == py_kept, did
    # the head survives whole; the tail is thinned
    n_head = sum(1 for b, _, _ in samp.values() if b == "head")
    kept_head = sum(1 for b, _, k in samp.values() if b == "head" and k)
    kept_tail = sum(1 for b, _, k in samp.values() if b == "tail" and k)
    n_tail = sum(1 for b, _, _ in samp.values() if b == "tail")
    assert kept_head == n_head
    assert kept_tail < n_tail * 0.3
    # degenerate inputs refuse loudly: no scored docs / bad cuts
    empty = spark.createDataFrame(
        [(1, None)], "doc_id long, bits_per_token double")
    with pytest.raises(ValueError, match="no scored"):
        sampling.perplexity_buckets(empty, "doc_id")
    with pytest.raises(ValueError, match="cuts"):
        sampling.perplexity_buckets(scores, "doc_id", cuts=(0.7, 0.3))
