"""Gap filling — `intervals.gap_fill` (time_bucket_gapfill surface).

Twin: pure-python densify + zero/locf/linear-interp over a crafted
sparse series (per-group and global). The zero-fill mode over event
counts is additionally ORACLE-GATED cross-engine via the
multi_resolution_rollup entry's series='filled' rows (DuckDB
range()+LEFT JOIN rebuild).
"""

import pytest

from amazon_kinesis_replay_spark.operators import intervals as iv

# (key, bucket, value) — gaps of 1 and 2 steps, per-key ranges differ
ROWS = [
    ("a", 0, 10.0), ("a", 30, 40.0), ("a", 40, 20.0),
    ("b", 10, 5.0), ("b", 50, 9.0),
]
STEP = 10


def _twin(mode):
    out = {}
    for key in {r[0] for r in ROWS}:
        obs = {b: v for k, b, v in ROWS if k == key}
        lo, hi = min(obs), max(obs)
        series = []
        for b in range(lo, hi + STEP, STEP):
            if b in obs:
                series.append((key, b, obs[b], 0))
                continue
            if mode == "zero":
                v = 0.0
            elif mode == "locf":
                prevs = [x for x in obs if x < b]
                v = obs[max(prevs)] if prevs else None
            else:
                prevs = [x for x in obs if x < b]
                nxts = [x for x in obs if x > b]
                if prevs and nxts:
                    p, n = max(prevs), min(nxts)
                    v = obs[p] + (obs[n] - obs[p]) * (b - p) / (n - p)
                else:
                    v = None
            series.append((key, b, v, 1))
        out[key] = series
    return sorted(x for s in out.values() for x in s)


@pytest.mark.parametrize("mode", ["zero", "locf", "interp"])
def test_gap_fill_matches_python_twin(spark, mode):
    df = spark.createDataFrame(ROWS, "key string, bucket long, v double")
    got = iv.gap_fill(df, "bucket", "v", STEP, mode=mode,
                      group_cols=["key"])
    rows = sorted((r["key"], r["bucket"], r["v"], r["filled"])
                  for r in got.collect())
    assert rows == _twin(mode)


def test_gap_fill_global_series(spark):
    df = spark.createDataFrame([(0, 1.0), (30, 4.0)], "bucket long, v double")
    got = {r["bucket"]: (r["v"], r["filled"])
           for r in iv.gap_fill(df, "bucket", "v", 10,
                                mode="interp").collect()}
    assert got == {0: (1.0, 0), 10: (2.0, 1), 20: (3.0, 1), 30: (4.0, 0)}


def test_gap_fill_locf_null_before_first_observation(spark):
    df = spark.createDataFrame(
        [("k", 20, 7.0), ("k", 0, None)], "key string, bucket long, v double")
    # bucket 0 exists with NULL value: locf must NOT invent a value there
    got = {r["bucket"]: r["v"]
           for r in iv.gap_fill(df, "bucket", "v", 10, mode="locf",
                                group_cols=["key"]).collect()}
    assert got == {0: None, 10: None, 20: 7.0}


def test_gap_fill_rejects_unknown_mode(spark):
    df = spark.createDataFrame([(0, 1.0)], "bucket long, v double")
    with pytest.raises(ValueError, match="mode"):
        iv.gap_fill(df, "bucket", "v", 10, mode="nearest")


def test_gap_fill_interp_plan_single_sort(spark):
    """interp's backward + forward frames must share ONE keyed sort."""
    df = spark.createDataFrame(ROWS, "key string, bucket long, v double")
    plan = (iv.gap_fill(df, "bucket", "v", STEP, mode="interp",
                        group_cols=["key"])
            ._jdf.queryExecution().executedPlan().toString())
    # ONE Window node evaluates both the backward (locf) and forward
    # (next-observation) frames — they share the (key, bucket) sort
    assert plan.count("Window [") == 1
    assert "windowspecdefinition(key" in plan  # keyed, not global


def test_gap_fill_filled_flag_marks_inserted_rows_only(spark):
    """Review finding: filled=1 means the SPINE inserted the row; a
    present row with a NULL value keeps filled=0, and zero mode must
    not rewrite the observed NULL to 0."""
    df = spark.createDataFrame(
        [("k", 0, None), ("k", 20, 7.0)], "key string, bucket long, v double")
    got = {r["bucket"]: (r["v"], r["filled"])
           for r in iv.gap_fill(df, "bucket", "v", 10, mode="zero",
                                group_cols=["key"]).collect()}
    assert got == {0: (None, 0), 10: (0.0, 1), 20: (7.0, 0)}
