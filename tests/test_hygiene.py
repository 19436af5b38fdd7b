"""Lint-style hygiene pins (r8 verdict item 8): grep rules previous
rounds enforced by hand, frozen as tests so drift cannot recur.

Each rule encodes a 100 TB scale invariant:
- `.collect()` / `.toPandas()` pull data onto the driver — allowed only
  in files whose collects are bounded-small BY CONSTRUCTION (vocab-capped
  BPE merges, dim-sized gradients, centroid/codebook tables, 1-row stat
  frames), pinned as an explicit allowlist.
- `crossJoin` is a cartesian product — every call site must broadcast a
  provably tiny side (anchor row / query vector / salt range).
- "rows-only" in package source is docstring drift: since r7 the whole
  registry is hash-gated, so any new claim of a rows-only check is
  either stale history or a regression being documented instead of
  fixed.
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "amazon_kinesis_replay_spark"

#: Files where driver-side collection is sanctioned because the collected
#: frame is bounded-small by construction (NOT corpus-scale). Growing this
#: list requires the same justification in the file's docstring.
COLLECT_ALLOWED = {
    "operators/classifier.py",   # dim-sized gradient vector per iteration
    "operators/similarity.py",   # centroid / codebook / k-means tables
    "operators/text.py",         # vocab-capped BPE merge aggregate
    "operators/sampling.py",     # len(cuts)-row quantile cut points off
                                 # the <=8k-row sketch (perplexity_buckets)
    "export.py",                 # verify_shards diffs the MANIFEST —
                                 # one row per shard FILE (metadata-
                                 # scale, ~10^5 at 100 TB), never data
    "sources/ndjson.py",         # sniff-fallback SUSPECT PATH list —
                                 # bounded by max_fallback_files (loud
                                 # error beyond), paths not data
}
TOPANDAS_ALLOWED = {
    "streaming/replay.py",       # 1-row anchor / per-partition stat frames
}


def _py_sources():
    return sorted(PKG.rglob("*.py"))


def _rel(p: Path) -> str:
    return str(p.relative_to(PKG))


def test_collect_only_in_allowlisted_files():
    offenders = {}
    for p in _py_sources():
        hits = [i + 1 for i, line in enumerate(p.read_text().splitlines())
                if ".collect()" in line]
        if hits and _rel(p) not in COLLECT_ALLOWED:
            offenders[_rel(p)] = hits
    assert not offenders, (
        f"driver-side .collect() outside the bounded-small allowlist: "
        f"{offenders} — distribute the computation or justify + allowlist")


def test_topandas_only_in_allowlisted_files():
    offenders = {}
    for p in _py_sources():
        hits = [i + 1 for i, line in enumerate(p.read_text().splitlines())
                if ".toPandas()" in line]
        if hits and _rel(p) not in TOPANDAS_ALLOWED:
            offenders[_rel(p)] = hits
    assert not offenders, (
        f".toPandas() outside the allowlist: {offenders}")


def test_every_crossjoin_broadcasts_a_tiny_side():
    """The 120 chars after each crossJoin( must contain F.broadcast —
    a cartesian product is only acceptable against a provably tiny
    broadcast side (1-row anchor, query vector, salt range)."""
    offenders = []
    for p in _py_sources():
        src = p.read_text()
        for m in re.finditer(r"\.crossJoin\(", src):
            window = src[m.end():m.end() + 120]
            if "broadcast" not in window:
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{_rel(p)}:{line}")
    assert not offenders, (
        f"crossJoin without a broadcast side: {offenders}")


def test_no_rows_only_claims_in_package_source():
    offenders = []
    for p in _py_sources():
        for i, line in enumerate(p.read_text().splitlines()):
            if "rows-only" in line:
                offenders.append(f"{_rel(p)}:{i + 1}")
    assert not offenders, (
        f"stale 'rows-only' claim in package source: {offenders} — the "
        "registry has been fully hash-gated since r7; reword or fix")


def test_no_row_at_a_time_python_udf():
    """Python in the hot path must be Arrow-batched (pandas_udf /
    mapInPandas / applyInPandas) — a row-at-a-time F.udf( call is the
    10-100x slow path and must not reappear."""
    offenders = []
    for p in _py_sources():
        for i, line in enumerate(p.read_text().splitlines()):
            if re.search(r"\bF\.udf\(|\budf\(lambda", line):
                offenders.append(f"{_rel(p)}:{i + 1}")
    assert not offenders, f"row-at-a-time Python UDF: {offenders}"


def test_bench_attempt_quiet_predicate_is_steal_proof():
    """r10 verdict item 1: the burst-retry predicate must trip on
    whole-window /proc meters, not only the dodgeable mp-canary min.
    Pins the predicate against the REAL attempt records: the loaded
    r10 driver attempt (steal 4.2 / load1 7.56 / mp 0.1757 — published
    25.58 s where the quiet tree measured 18.5-19.6 s) must now
    re-run; both recorded quiet closes must still publish."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    r10_loaded = {"canary_mp_sec": 0.1757, "canary_sec": 0.2191,
                  "steal_pct": 4.2, "load1": 7.56}
    assert not bench._attempt_is_quiet(r10_loaded)

    r10_local = {"canary_mp_sec": 0.1749, "canary_sec": 0.1907,
                 "steal_pct": 0.01, "load1": 3.58}
    r10_close2 = {"canary_mp_sec": 0.1643, "canary_sec": 0.2194,
                  "steal_pct": 0.94, "load1": 4.46}
    assert bench._attempt_is_quiet(r10_local)
    assert bench._attempt_is_quiet(r10_close2)

    # each meter trips independently
    assert not bench._attempt_is_quiet(
        {"canary_mp_sec": 0.1643, "steal_pct": 1.5, "load1": 3.0})
    assert not bench._attempt_is_quiet(
        {"canary_mp_sec": 0.1643, "steal_pct": 0.0, "load1": 9.0})
    assert not bench._attempt_is_quiet(
        {"canary_mp_sec": 0.30, "steal_pct": 0.0, "load1": 1.0})
    # r11 advice: on Linux a MISSING /proc meter means the sampling
    # failed — it must read not-quiet instead of silently degrading to
    # the dodgeable canary-only predicate (non-Linux keeps the fallback)
    import sys as _sys
    if _sys.platform.startswith("linux"):
        assert not bench._attempt_is_quiet({"canary_mp_sec": 0.15})
        assert bench._quiet_failures({"canary_mp_sec": 0.15}) == [
            "steal_pct_missing", "load1_missing"]
    else:
        assert bench._attempt_is_quiet({"canary_mp_sec": 0.15})
    # the failure list names each tripped meter
    assert bench._quiet_failures(r10_loaded) == ["steal_pct", "load1"]
    assert bench._quiet_failures(r10_local) == []


def test_bench_publish_is_self_describing():
    """r11 verdict item 4: the published JSON must carry
    published_attempt_quiet + the failing meters so a retry-cap
    publication (like r11's best attempt at steal 1.61%) is legible to
    the driver without forensics. Pins the source, so a refactor that
    drops the flag fails here rather than silently."""
    src = open("/root/repo/bench.py").read()
    assert '"published_attempt_quiet": _attempt_is_quiet(best)' in src
    assert '"quiet_fail_meters": _quiet_failures(best)' in src


def test_operator_persists_are_catalog_reclaimable(spark, sf_dir):
    """r13 verdict item 7: operator-internal persists (shingle arrays,
    PPJoin prefix index, LSH band entries) are created inside registry
    queries whose callers never get control back, so they must be
    CATALOG-scoped — one `spark.catalog.clearCache()` (what bench.py now
    runs between samples) must reclaim every block. A raw RDD-level
    persist would dodge the catalog and accrete storage for the life of
    a long-running session; this pins that none exists on the persisted-
    subtree query paths. (localCheckpoint blocks are ContextCleaner-
    reclaimed on GC and are deliberately out of scope here — the checked
    queries use catalog persists only.)"""
    from amazon_kinesis_replay_spark.plans import QUERIES

    jsc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    for name in ("minhash_dedup", "ngram_jaccard_dedup", "doc_train_split"):
        QUERIES[name].fn(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
    assert jsc.getPersistentRDDs().size() > base, \
        "fixture drift: these queries are expected to persist subtrees"
    spark.catalog.clearCache()
    assert jsc.getPersistentRDDs().size() <= base, (
        "operator persists survived clearCache — an RDD-level persist "
        "outside the catalog leaks storage in long-lived sessions")


def test_ensure_engine_conf_memoized_per_session(spark):
    """r13 opt: ensure_engine_conf is ~34 py4j round trips and
    tables.load calls it on EVERY load (memo hits included), so it is
    memoized per session object. Pins both halves of the contract:
    (a) a repeat call is a no-op — it must NOT re-assert a conf a test
    deliberately flipped mid-session (AQE-off tests rely on their
    setting surviving engine calls); (b) the memo flag is set, so the
    fast path is actually taken."""
    from amazon_kinesis_replay_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    assert getattr(spark, "_akrs_conf_asserted", False) is True
    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        ensure_engine_conf(spark)  # memo hit: must not override
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.set(key, orig)
