"""Deterministic corpus-sampling operators for training-data mixtures.

Temperature-weighted domain mixture sampling (the multilingual-LM
standard: sampled share q_d proportional to (weight x size)^(1/T)),
deterministic hash subsampling (no RNG state — reruns and engines
agree), and DSIR-style importance resampling (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling": rank raw
documents by the log-likelihood ratio between a target-domain n-gram LM
and a raw-pool n-gram LM, then sample with Gumbel-top-k).

Everything is DataFrame ops: per-domain rates come from one map-side
combinable groupBy over a domain column (metadata-scale result,
broadcast back), membership tests are pure column arithmetic on a
multiplicative hash of the id, and DSIR scoring reuses the distributed
n-gram LM join shape (operators/text.py). Nothing collects corpus-sized
data on the driver — the only driver-side collect is
perplexity_buckets' len(cuts)-row quantile frame, read off the
bounded (<=8k-row) quantile-histogram sketch, never the corpus
(hygiene allowlist justification).

Cross-engine exactness (the oracle-gate discipline of this repo): at
temperature=2.0 the whole rate computation uses only correctly-rounded
IEEE double ops (sqrt / multiply / divide) plus one decimal-summed
total, so DuckDB reproduces the kept-set bit-for-bit; other
temperatures go through pow(), which libm implementations round
differently — fine for production, not for hash gates (documented on
the function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Multiplier for the sampling hash — a different odd constant than the
#: split hash (2654435761, registry q_doc_train_split) so "which split"
#: and "sampled?" are not correlated through a shared residue chain.
_SAMPLE_MULT = 2246822519

#: Quantization of sampling rates: membership is `hash mod 1e6 < ppm`,
#: so rates resolve to parts-per-million — coarse enough that a 1-ulp
#: rate difference would have to land exactly on a floor boundary to
#: matter, and at T=2 there is no ulp difference at all.
_PPM = 1_000_000


def hash_ppm(id_col: Column) -> Column:
    """Deterministic uniform-ish value in [0, 1e6) from an integer id —
    multiplicative hashing, the same family as the train/valid/test
    split bucket. Pure column arithmetic, no RNG.

    Overflow-safe for the FULL long id range (r8 advice item): the
    double-pmod identity (id*M) % 1e6 == ((id%1e6)*M) % 1e6 keeps the
    product <= ~2.2e15 — the bare product throws an ANSI overflow for
    ids >= ~4.1e9, exactly the id spaces a 100 TB corpus has. Values
    are unchanged wherever the old form didn't overflow; the
    doc_train_split oracle SQL mirrors the same rewrite."""
    return F.pmod(F.pmod(id_col.cast("long"), F.lit(_PPM))
                  * F.lit(_SAMPLE_MULT), F.lit(_PPM))


def hash_ppm_expr(id_sql: str) -> str:
    """SQL twin of `hash_ppm` (r13 construction-cost pass; same types —
    the multiplier parses as BIGINT, {_PPM} as INT, like the lits)."""
    return (f"pmod(pmod(CAST({id_sql} AS BIGINT), {_PPM}) "
            f"* {_SAMPLE_MULT}, {_PPM})")


def deterministic_sample(df: DataFrame, id_col: str,
                         rate: float) -> DataFrame:
    """Uniform deterministic subsample: keep iff
    hash_ppm(id) < floor(rate * 1e6). Stable under reruns, resumable,
    and engine-portable — the property a 100 TB pipeline needs from a
    sample (a Bernoulli RNG sample is none of those)."""
    return df.filter(hash_ppm(F.col(id_col)) < int(rate * _PPM))


def temperature_mixture_rates(df: DataFrame, domain_col: str,
                              weight, target_frac: float = 0.5,
                              temperature: float = 2.0) -> DataFrame:
    """Per-domain sampling rates for temperature mixture sampling.

    q_d  ∝  (w_d * n_d)^(1/T)          (sampled share of domain d)
    rate_d = min(1, target_frac * N * q_d / n_d)

    returned quantized: (domain, n_docs, rate_ppm). `weight` is a
    callable Column -> Column evaluated on the domain value (a plan
    literal / pure function — e.g. a CASE over domain names), or None
    for weight 1.

    T=2 (the default) evaluates as sqrt(w*n) — sqrt, multiply and
    divide are correctly-rounded IEEE ops, and the cross-domain total
    sums floor-quantized longs (r10, replacing the mirrored decimal
    cast — see similarity._Q_SCALE: Spark and DuckDB disagreed on
    shortest-repr midpoint ties; floor(v*1e12+0.5) is pure IEEE and
    identical in both) in a decimal(38,0) accumulator, so an oracle
    SQL engine computes the identical rate_ppm. Other T values use
    pow() and are NOT bit-portable across engines (libm variance);
    they remain available for production use.

    Scale shape: one map-side-combinable count per domain (the result
    is domain-cardinality — metadata), cross-domain totals via an
    unpartitioned window over that tiny frame. The corpus is scanned
    once and never shuffled on rows.
    """
    w = weight(F.col(domain_col)) if weight is not None else F.lit(1)
    # double, NOT long: a fractional weight (0.5, 2.9) must scale the
    # share, not silently truncate — a weight in (0,1) cast to long
    # would zero the domain out of the sample entirely (review
    # finding). Integer-valued weights stay exact in double, so the
    # T=2 cross-engine bit-match is unchanged.
    counts = (df.groupBy(domain_col)
              .agg(F.expr("count(*) AS n_docs"))
              .withColumn("__w", w.cast("double")))
    # r13: the rate pipeline below is composed as SQL strings (one
    # selectExpr) — the withColumn chain paid ~500 py4j round trips of
    # construction latency per composed-query build; ops and literal
    # types are unchanged (sqrt/multiply/divide doubles, the
    # floor-quantized decimal(38,0) window total), so rate_ppm is
    # bit-identical (doc_train_split's oracle gate pins it).
    if temperature == 2.0:
        s = "sqrt(__w * CAST(n_docs AS DOUBLE))"
    else:
        s = f"power(__w * CAST(n_docs AS DOUBLE), {1.0 / temperature!r}D)"
    # cross-domain totals as an UNPARTITIONED window over the counts
    # frame — acceptable precisely because this frame is
    # domain-cardinality (metadata), and it keeps a (harmless but
    # plan-pin-tripping) broadcast-nested-loop totals join out of every
    # composed query's physical plan. The decimal window-sum is the
    # same exact order-independent total the agg form computed.
    stot = ("(CAST(sum(CAST(floor(__s * 1.0E12D + 0.5D) "
            "AS decimal(38,0))) OVER () AS DOUBLE) / 1.0E12D)")
    rate = (f"least(1.0D, ({float(target_frac)!r}D "
            f"* CAST(sum(n_docs) OVER () AS DOUBLE)) "
            f"* (__s / {stot}) / CAST(n_docs AS DOUBLE))")
    return (counts.selectExpr("*", f"{s} AS __s")
            .selectExpr(domain_col, "n_docs",
                        f"CAST(floor({rate} * {float(_PPM)!r}D) AS BIGINT) "
                        "AS rate_ppm"))


def mixture_sample(df: DataFrame, id_col: str, domain_col: str,
                   weight=None, target_frac: float = 0.5,
                   temperature: float = 2.0) -> DataFrame:
    """Tag every row with its domain's temperature-mixture rate and the
    deterministic keep verdict: adds (mix_rate_ppm, mix_kept). Filter
    on mix_kept for the sampled corpus; keeping the verdict as a column
    (instead of filtering here) lets one pass feed both the sample and
    its audit (per-domain kept counts vs target shares).

    The rates table is domain-cardinality — broadcast; the corpus scan
    stays pipeline-local (no shuffle of data rows).
    """
    rates = temperature_mixture_rates(df, domain_col, weight,
                                      target_frac, temperature)
    r = rates.select(F.col(domain_col).alias("__dom"), "rate_ppm")
    # NULL-SAFE join: a NULL domain is a real domain — groupBy gave it
    # a rates row, and an inner equi-join would silently drop its docs
    # while still counting them in the total, inflating every other
    # domain's rate (review finding)
    return (df.join(F.broadcast(r),
                    F.col(domain_col).eqNullSafe(F.col("__dom")))
            .selectExpr(*df.columns,
                        "rate_ppm AS mix_rate_ppm",
                        f"({hash_ppm_expr(id_col)} < rate_ppm) "
                        "AS mix_kept"))


# --------------------------------------------------------------------------
# DSIR — importance resampling between two n-gram LMs
# --------------------------------------------------------------------------


def dsir_stats(df: DataFrame, id_col: str, text_col: str,
               target_lm: DataFrame, raw_lm: DataFrame,
               n: int = 2) -> DataFrame:
    """EXACT-INTEGER sufficient statistics of a document against a
    target and a raw n-gram count model: (id, n_grams, t_seen, t_sum,
    r_seen, r_sum) — gram count, how many grams each model has seen,
    and the summed model counts. These are the hash-gateable core of
    DSIR scoring (the float log-ratio in dsir_log_weights is built from
    exactly these joins); they are also the right thing to persist at
    scale, since logs can be re-applied to stats without re-scanning
    text.

    One explode + two LEFT hash joins on (context, token) + one per-doc
    aggregate; AQE broadcasts small models.
    """
    from . import text as _text
    g = (df.select(F.col(id_col).alias("__id"),
                   F.explode(_text._word_ngrams(F.col(text_col), n))
                   .alias("g"))
         .select("__id", "g.context", "g.token"))
    t = target_lm.select("context", "token", F.col("cnt").alias("__tc"))
    r = raw_lm.select("context", "token", F.col("cnt").alias("__rc"))
    per = (g.join(t, ["context", "token"], "left")
           .join(r, ["context", "token"], "left")
           .groupBy("__id")
           .agg(F.count("*").cast("long").alias("n_grams"),
                F.count("__tc").cast("long").alias("t_seen"),
                F.coalesce(F.sum("__tc"), F.lit(0)).cast("long")
                .alias("t_sum"),
                F.count("__rc").cast("long").alias("r_seen"),
                F.coalesce(F.sum("__rc"), F.lit(0)).cast("long")
                .alias("r_sum")))
    return (df.select(F.col(id_col).alias("__id")).distinct()
            .join(per, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    *[F.coalesce(c, F.lit(0)).cast("long").alias(c)
                      for c in ("n_grams", "t_seen", "t_sum",
                                "r_seen", "r_sum")]))


def dsir_log_weights(df: DataFrame, id_col: str, text_col: str,
                     target_lm: DataFrame, raw_lm: DataFrame,
                     n: int = 2, k: float = 0.5) -> DataFrame:
    """Per-document DSIR importance log-weight:

    log w(x) = sum_g [ log p_target(g) - log p_raw(g) ]

    with add-k-smoothed gram probabilities under each model
    (p(tok|ctx) = (cnt + k) / (ctx_cnt + k * V), the ngram_lm_score
    convention). High log_w = looks like the target domain relative to
    the raw pool. Documents shorter than n words get NULL (no silent
    drop). Output: (id, n_grams, log_w).

    Same two-hash-join plan as dsir_stats plus per-context totals; only
    the two vocab sizes touch the driver (metadata-scale counts).
    """
    from . import text as _text
    v_t = target_lm.select("token").distinct().count()
    v_r = raw_lm.select("token").distinct().count()
    t_ctx = target_lm.groupBy("context").agg(
        F.sum("cnt").alias("__tctx"))
    r_ctx = raw_lm.groupBy("context").agg(
        F.sum("cnt").alias("__rctx"))
    g = (df.select(F.col(id_col).alias("__id"),
                   F.explode(_text._word_ngrams(F.col(text_col), n))
                   .alias("g"))
         .select("__id", "g.context", "g.token"))
    t = target_lm.select("context", "token", F.col("cnt").alias("__tc"))
    r = raw_lm.select("context", "token", F.col("cnt").alias("__rc"))
    kf = F.lit(float(k))
    lp_t = (F.log(F.coalesce("__tc", F.lit(0)) + kf)
            - F.log(F.coalesce("__tctx", F.lit(0)) + F.lit(float(k * v_t))))
    lp_r = (F.log(F.coalesce("__rc", F.lit(0)) + kf)
            - F.log(F.coalesce("__rctx", F.lit(0)) + F.lit(float(k * v_r))))
    per = (g.join(t, ["context", "token"], "left")
           .join(r, ["context", "token"], "left")
           .join(t_ctx, "context", "left")
           .join(r_ctx, "context", "left")
           .groupBy("__id")
           .agg(F.count("*").cast("long").alias("n_grams"),
                F.sum(lp_t - lp_r).alias("log_w")))
    return (df.select(F.col(id_col).alias("__id")).distinct()
            .join(per, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    "log_w"))


def _hashed_gram_buckets(text_col: Column, n_buckets: int,
                         ns: tuple = (1, 2)) -> Column:
    """array<long> of hashed word-n-gram bucket ids — the DSIR paper's
    feature map (Xie et al. 2023, §2.2: hashed unigram+bigram counts
    into m buckets). Gram string = the n words space-joined; bucket =
    pmod(xxhash64(gram), m). Pure column expression (whole-stage
    codegen); the python twin is the SIGNED interpretation of
    xxh64_string(gram) taken % m (python % is already a positive mod),
    which is what makes the bucket geometry hash-gateable."""
    from . import text as _text
    arrs = []
    for n in ns:
        grams = _text._word_ngrams(text_col, n)
        if n == 1:
            # branch on n, NOT on context == '': an n>1 gram whose first
            # word is the empty token also has an empty context, and
            # collapsing it to the bare token would alias it with the
            # unigram (caught by the twin test on whitespace-edge docs)
            arrs.append(F.transform(grams, lambda g: g["token"]))
        else:
            arrs.append(F.transform(
                grams,
                lambda g: F.concat(g["context"], F.lit(" "), g["token"])))
    allg = F.concat(*arrs) if len(arrs) > 1 else arrs[0]
    return F.transform(allg,
                       lambda s: F.pmod(F.xxhash64(s), F.lit(n_buckets)))


def dsir_hashed_counts(df: DataFrame, text_col: str,
                       n_buckets: int = 10_000, ns: tuple = (1, 2),
                       id_col: str | None = None) -> DataFrame:
    """Hashed-n-gram bucket counts: (bucket, cnt) over a corpus, or
    (id, bucket, cnt) per document when id_col is given. The CORPUS form
    IS the DSIR bag-of-hashed-ngrams model — train the target and raw
    models by calling this on each corpus. Mergeable by cell-wise sum
    (like CMS: additive, not idempotent), so daily crawls fold without
    re-scanning history. One explode + one map-side-combinable groupBy;
    the corpus model is at most n_buckets rows regardless of input."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(_hashed_gram_buckets(F.col(text_col), n_buckets, ns))
        .alias("bucket")]
    keys = ([id_col] if id_col else []) + ["bucket"]
    return (df.select(*cols).groupBy(*keys)
            .agg(F.count("*").cast("long").alias("cnt")))


def dsir_hashed_stats(df: DataFrame, id_col: str, text_col: str,
                      target_counts: DataFrame, raw_counts: DataFrame,
                      n_buckets: int = 10_000,
                      ns: tuple = (1, 2)) -> DataFrame:
    """EXACT-INTEGER sufficient statistics of each document against two
    hashed-bucket models: (id, hb_grams, hb_t_sum, hb_r_sum) — total
    hashed grams, and the doc-count-weighted sums of the target/raw
    model bucket counts (sum_b c_b(doc) * model_cnt(b)). The float
    log-ratio in dsir_hashed_log_weights is built from exactly these
    joins, so gating the integers pins the whole bucket geometry + hash
    while keeping libm logs out of the gate (the dsir_stats pattern)."""
    per = dsir_hashed_counts(df, text_col, n_buckets, ns, id_col=id_col)
    t = target_counts.select("bucket", F.col("cnt").alias("__tc"))
    r = raw_counts.select("bucket", F.col("cnt").alias("__rc"))
    agg = (per.join(t, "bucket", "left").join(r, "bucket", "left")
           .groupBy(id_col)
           .agg(F.sum("cnt").cast("long").alias("hb_grams"),
                F.coalesce(F.sum(F.col("cnt") * F.col("__tc")), F.lit(0))
                .cast("long").alias("hb_t_sum"),
                F.coalesce(F.sum(F.col("cnt") * F.col("__rc")), F.lit(0))
                .cast("long").alias("hb_r_sum")))
    return (df.select(F.col(id_col)).distinct()
            .join(agg, id_col, "left")
            .select(id_col,
                    *[F.coalesce(c, F.lit(0)).cast("long").alias(c)
                      for c in ("hb_grams", "hb_t_sum", "hb_r_sum")]))


def dsir_hashed_log_weights(df: DataFrame, id_col: str, text_col: str,
                            target_counts: DataFrame,
                            raw_counts: DataFrame,
                            n_buckets: int = 10_000, ns: tuple = (1, 2),
                            k: float = 0.5) -> DataFrame:
    """Per-document DSIR importance log-weight in the paper's hashed
    formulation: log w(x) = sum_b c_b(x) * (log p_t[b] - log p_r[b])
    with add-k smoothed bucket probabilities p[b] = (cnt_b + k) /
    (total + k*m). Documents with zero grams get NULL log_w (no silent
    drop). Output: (id, hb_grams, log_w) — feed dsir_sample for the
    deterministic Gumbel-top-k draw.

    Plan: per-doc bucket counts -> two LEFT joins against the at-most-m-
    row models (AQE broadcasts them) -> one per-doc aggregate. Only the
    two scalar totals touch the driver."""
    import math
    m = n_buckets
    t_tot = int(target_counts.agg(F.sum("cnt")).head()[0] or 0)
    r_tot = int(raw_counts.agg(F.sum("cnt")).head()[0] or 0)
    per = dsir_hashed_counts(df, text_col, n_buckets, ns, id_col=id_col)
    t = target_counts.select("bucket", F.col("cnt").alias("__tc"))
    r = raw_counts.select("bucket", F.col("cnt").alias("__rc"))
    kf = float(k)
    lp = (F.log(F.coalesce("__tc", F.lit(0)) + F.lit(kf))
          - F.lit(math.log(t_tot + kf * m))
          - F.log(F.coalesce("__rc", F.lit(0)) + F.lit(kf))
          + F.lit(math.log(r_tot + kf * m)))
    agg = (per.join(t, "bucket", "left").join(r, "bucket", "left")
           .groupBy(id_col)
           .agg(F.sum("cnt").cast("long").alias("hb_grams"),
                F.sum(F.col("cnt") * lp).alias("log_w")))
    return (df.select(F.col(id_col)).distinct()
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("hb_grams", F.lit(0)).cast("long")
                    .alias("hb_grams"),
                    "log_w"))


def perplexity_buckets(scores: DataFrame, id_col: str,
                       bits_col: str = "bits_per_token",
                       cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
                       sig_bits: int = 16) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): split
    the corpus into perplexity terciles under a target-domain LM —
    'head' = most fluent/in-domain, 'tail' = noise. Input is the
    (id, bits_per_token) frame `text.ngram_lm_score` produces.

    The cut points come from the deterministic quantile histogram over
    truncated milli-bits (bits * 1000 as long): bits-per-token lives
    well under 65.536, so every scaled value is in the sketch's EXACT
    range at sig_bits=16 and the lower-bound decode returns an exact
    data value — the bucketing is rerun- and partition-stable where an
    approxQuantile cut would not be. One sketch build + one tiny
    quantile walk; the corpus is scanned, never sorted.

    Output: (id, bits, ppl_bucket) with ppl_bucket in
    'head'/'middle'/'tail' (NULL-score docs keep a NULL bucket — no
    silent drop)."""
    if len(cuts) != 2 or not 0.0 < cuts[0] < cuts[1] < 1.0:
        raise ValueError(f"cuts must be two quantiles in (0,1), "
                         f"ascending; got {cuts!r}")
    from . import sketches
    mb = (F.col(bits_col) * F.lit(1000.0)).cast("long")
    qh = sketches.qhist_table(
        scores.select(mb.alias("__mb")), "__mb", sig_bits=sig_bits)
    qrows = sketches.qhist_quantiles(
        qh, [float(c) for c in cuts], sig_bits=sig_bits,
        point="lower").collect()
    if not qrows:
        raise ValueError(
            "perplexity_buckets: no scored documents (every "
            f"{bits_col} is NULL or the frame is empty) — nothing to "
            "bucket; score the corpus with text.ngram_lm_score first")
    t = {round(r["prob"], 9): int(r["value_est"]) for r in qrows}
    t1, t2 = t[round(float(cuts[0]), 9)], t[round(float(cuts[1]), 9)]
    bucket = (F.when(F.col(bits_col).isNull(), F.lit(None).cast("string"))
              .when(mb < F.lit(t1), "head")
              .when(mb < F.lit(t2), "middle")
              .otherwise("tail"))
    return scores.select(F.col(id_col),
                         F.col(bits_col).alias("bits"),
                         bucket.alias("ppl_bucket"))


def perplexity_bucket_sample(scores: DataFrame, id_col: str,
                             keep: dict | None = None,
                             bits_col: str = "bits_per_token",
                             cuts: tuple = (1.0 / 3.0, 2.0 / 3.0)) -> DataFrame:
    """The CCNet sampling step over the buckets: keep each bucket at its
    own rate (default: all of head, half of middle, a tenth of tail —
    the classic downweight-the-noisy-tail mixture). Membership is the
    deterministic hash_ppm verdict, so the sample is rerun-stable and
    needs no RNG state. NULL-bucket docs (short texts) are dropped with
    rate 0 unless `keep` maps None explicitly. Output adds
    (ppl_bucket, ppl_rate_ppm, ppl_kept)."""
    keep = keep if keep is not None else {"head": 1.0, "middle": 0.5,
                                          "tail": 0.1}
    b = perplexity_buckets(scores, id_col, bits_col=bits_col, cuts=cuts)
    rate = F.lit(0)
    for name, frac in keep.items():
        ppm = int(float(frac) * _PPM)
        if name is None:
            rate = F.when(F.col("ppl_bucket").isNull(), ppm).otherwise(rate)
        else:
            rate = F.when(F.col("ppl_bucket") == name, ppm).otherwise(rate)
    return (b.withColumn("ppl_rate_ppm", rate.cast("long"))
            .withColumn("ppl_kept",
                        hash_ppm(F.col(id_col)) < F.col("ppl_rate_ppm")))


def dsir_sample(weights: DataFrame, id_col: str, k: int,
                log_w_col: str = "log_w",
                clip_log_w: float | None = None) -> DataFrame:
    """Gumbel-top-k importance sample over DSIR log-weights: key =
    log_w + Gumbel noise, take the k largest — equivalent to sampling k
    items without replacement with probability proportional to w (the
    Gumbel-max trick). The noise is DERIVED from the id hash
    (u = (hash_ppm + 0.5) / 1e6, g = -ln(-ln u)) so the sample is
    deterministic and rerun-stable; NULL-weight rows (short docs) are
    excluded. The global top-k is a TakeOrdered — no full sort.

    clip_log_w caps the log-weight at a ceiling BEFORE the Gumbel draw
    (importance-weight clipping, the standard variance bound: a few
    extreme-ratio documents would otherwise be sampled almost surely
    and dominate the draw; clipped docs still rank above unclipped ones
    of lower weight, but compete on noise among themselves)."""
    u = (hash_ppm(F.col(id_col)).cast("double") + F.lit(0.5)) \
        / F.lit(float(_PPM))
    gumbel = -F.log(-F.log(u))
    w = F.col(log_w_col)
    if clip_log_w is not None:
        w = F.least(w, F.lit(float(clip_log_w)))
    return (weights.filter(F.col(log_w_col).isNotNull())
            .withColumn("gumbel_key", w + gumbel)
            .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
            .limit(k))
