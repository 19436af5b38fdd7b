"""Z-order layout: interleave twin, quantize bounds, and the measured
file-pruning witness (footer min-max stats, no scan)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.operators import layout
from amazon_kinesis_replay_spark.tables import load


def test_zvalue_matches_python_twin(spark, sf_dir):
    """Spark's shift/mask interleave == the driver twin on real rows
    (and via zvalue_sql the same arithmetic is what the registry gate
    runs in DuckDB — one bit-placement source of truth)."""
    ev = (load(spark, sf_dir, "events")
          .select(F.pmod(F.col("user_id"), F.lit(256)).alias("u"),
                  F.pmod(F.unix_millis("ts"), F.lit(256)).alias("m"))
          .limit(200))
    got = ev.withColumn(
        "z", layout.zvalue([F.col("u"), F.col("m")], bits=8)).collect()
    for r in got:
        assert r["z"] == layout.zvalue_py([r["u"], r["m"]], bits=8)
    # the SQL twin emits the identical bit placement, each term fully
    # parenthesized (DuckDB's flat bitwise-operator precedence)
    sql = layout.zvalue_sql(["u", "m"], bits=8)
    assert "((((u) >> 0) & 1) << 0)" in sql
    assert f"<< {7 * 2 + 1})" in sql         # top bit of dim 1


def test_zvalue_py_interleaves() -> None:
    # 1-D: identity on the low bits
    assert layout.zvalue_py([0b1011], bits=4) == 0b1011
    # 2-D: x bits at even, y bits at odd positions
    assert layout.zvalue_py([0b11, 0b00], bits=2) == 0b0101
    assert layout.zvalue_py([0b00, 0b11], bits=2) == 0b1010
    assert layout.zvalue_py([0b10, 0b01], bits=2) == 0b0110


def test_zvalue_guards() -> None:
    with pytest.raises(ValueError, match="> 63"):
        layout.zvalue([F.col("a")] * 8, bits=8)
    with pytest.raises(ValueError, match="1..8"):
        layout.zvalue([], bits=8)
    with pytest.raises(ValueError, match="hi > lo"):
        layout.quantize(F.col("a"), 5.0, 5.0, bits=4)


def test_quantize_clamps_and_is_monotone(spark):
    df = spark.createDataFrame(
        [(-10.0,), (0.0,), (24.9,), (25.0,), (99.9,), (100.0,), (250.0,)],
        "x double")
    got = [r["q"] for r in df.select(
        layout.quantize(F.col("x"), 0.0, 100.0, bits=2).alias("q"))
        .collect()]
    # 4 cells of width 25 over [0, 100); out-of-range clamps to edges
    assert got == [0, 0, 0, 1, 3, 3, 3]
    assert got == sorted(got)


def test_zorder_layout_prunes_files(spark, sf_dir, tmp_path):
    """The measured witness: write the same events frame (a) sorted by
    ts (the natural log layout) and (b) z-ordered on (user_id, ts),
    16 files each; count from parquet FOOTERS how many files a
    predicate must read. A user_id predicate prunes nothing under the
    ts layout (every file spans all users) and most files under
    z-order; the 2-D box must also read fewer z-ordered files."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts",
                F.unix_millis("ts").alias("ms"))
    lo_ms, hi_ms, lo_u, hi_u = ev.agg(
        F.min("ms"), F.max("ms"), F.min("user_id"), F.max("user_id")) \
        .head()
    qcols = [layout.quantize(F.col("user_id"), lo_u, hi_u + 1, bits=8),
             layout.quantize(F.col("ms"), lo_ms, hi_ms + 1, bits=8)]
    # a ~20% user band in the middle of the observed range
    u_a = lo_u + (hi_u - lo_u) * 2 // 10
    u_b = lo_u + (hi_u - lo_u) * 4 // 10

    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zorder")
    ev.repartitionByRange(16, "ts").sortWithinPartitions("ts") \
        .write.parquet(lin_dir)
    layout.layout_zorder(ev, qcols, bits=8, n_partitions=16) \
        .write.parquet(z_dir)

    def files_overlapping(d, col, lo, hi):
        n = 0
        for fp in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(fp).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}[col]
            f_lo = min(md.row_group(g).column(idx).statistics.min
                       for g in range(md.num_row_groups))
            f_hi = max(md.row_group(g).column(idx).statistics.max
                       for g in range(md.num_row_groups))
            if f_hi >= lo and f_lo <= hi:
                n += 1
        return n

    n_files = len(glob.glob(z_dir + "/*.parquet"))
    assert n_files >= 8                      # enough files to prune

    # 1-D user predicate: the middle band
    lin_u = files_overlapping(lin_dir, "user_id", u_a, u_b)
    z_u = files_overlapping(z_dir, "user_id", u_a, u_b)
    assert lin_u == len(glob.glob(lin_dir + "/*.parquet"))  # no pruning
    assert z_u < lin_u                       # z-order prunes users

    # 2-D box: both layouts prune on ts; z-order must still read fewer
    # TOTAL files (intersection of per-dimension overlaps)
    mid = (lo_ms + hi_ms) // 2
    span = (hi_ms - lo_ms) // 8

    def files_box(d):
        n = 0
        for fp in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(fp).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            ok = True
            for col, lo, hi in (("user_id", u_a, u_b),
                                ("ms", mid, mid + span)):
                i = idx[col]
                f_lo = min(md.row_group(g).column(i).statistics.min
                           for g in range(md.num_row_groups))
                f_hi = max(md.row_group(g).column(i).statistics.max
                           for g in range(md.num_row_groups))
                if f_hi < lo or f_lo > hi:
                    ok = False
                    break
            if ok:
                n += 1
        return n

    assert files_box(z_dir) < files_box(lin_dir)

    # pruning is lossless: both layouts return identical matching rows
    want = (ev.filter((F.col("user_id").between(u_a, u_b))
                      & (F.col("ms").between(mid, mid + span)))
            .select("event_id"))
    got = (spark.read.parquet(z_dir)
           .filter((F.col("user_id").between(u_a, u_b))
                   & (F.col("ms").between(mid, mid + span)))
           .select("event_id"))
    assert (sorted(r["event_id"] for r in want.collect())
            == sorted(r["event_id"] for r in got.collect()))


# -- Hilbert option ---------------------------------------------------------

def test_hilbert_is_a_continuous_bijection() -> None:
    """The defining Hilbert properties at bits=4 (256 cells): every
    curve position hit exactly once (bijection), and consecutive
    positions are GRID NEIGHBORS (|dx|+|dy| == 1) — the adjacency
    z-order famously lacks."""
    bits = 4
    n = 1 << bits
    pos = {}
    for x in range(n):
        for y in range(n):
            d = layout.hilbert_py(x, y, bits)
            assert d not in pos
            pos[d] = (x, y)
    assert sorted(pos) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_layout_hilbert_prunes_and_is_lossless(spark, sf_dir, tmp_path):
    """The Hilbert layout must beat the linear layout on the 1-D user
    band (same witness as z-order) and read back losslessly. Its
    pruning vs z-order is RECORDED, not asserted — fixture-dependent."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", F.unix_millis("ts").alias("ms"))
    lo_ms, hi_ms, lo_u, hi_u = ev.agg(
        F.min("ms"), F.max("ms"), F.min("user_id"), F.max("user_id")) \
        .head()
    qcols = [layout.quantize(F.col("user_id"), lo_u, hi_u + 1, bits=6),
             layout.quantize(F.col("ms"), lo_ms, hi_ms + 1, bits=6)]
    h_dir = str(tmp_path / "hilbert")
    layout.layout_hilbert(ev, qcols, bits=6, n_partitions=16) \
        .write.parquet(h_dir)
    u_a = lo_u + (hi_u - lo_u) * 2 // 10
    u_b = lo_u + (hi_u - lo_u) * 4 // 10

    import glob as g

    import pyarrow.parquet as pq
    total, hit = 0, 0
    for fp in g.glob(h_dir + "/*.parquet"):
        md = pq.ParquetFile(fp).metadata
        i = {md.schema.column(j).name: j
             for j in range(md.num_columns)}["user_id"]
        f_lo = min(md.row_group(r).column(i).statistics.min
                   for r in range(md.num_row_groups))
        f_hi = max(md.row_group(r).column(i).statistics.max
                   for r in range(md.num_row_groups))
        total += 1
        hit += (f_hi >= u_a and f_lo <= u_b)
    assert total >= 8
    assert hit < total                     # prunes where linear cannot
    got = spark.read.parquet(h_dir).select("event_id")
    assert got.count() == ev.count()
    assert got.distinct().count() == ev.count()

    with pytest.raises(ValueError, match=">= 2 dim"):
        layout.layout_hilbert(ev, [F.col("user_id")], bits=6)
    with pytest.raises(ValueError, match="4\\^bits"):
        layout.hilbert_lookup(spark, bits=11)


def test_hilbert_vs_morton_pruning_ab(spark, sf_dir, tmp_path):
    """The r8-verdict A/B: same frame, same bits, same 16 files — count
    from footers how many files 20 fixed-seed random 2-D boxes must
    read under Morton vs Hilbert. MEASURED RESULT (recorded r9):
    sf0.001 → zorder 73 vs hilbert 42; sf0.1 (probe script, 32 files,
    bits=8) → zorder 105 vs hilbert 78, so Hilbert's squarer file
    boxes genuinely out-prune Morton on this data and the option is
    KEPT. The assertion pins 'Hilbert reads no more files than Morton
    on the fixed workload' so a curve/layout regression is loud."""
    import random

    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", F.unix_millis("ts").alias("ms"))
    lo_ms, hi_ms, lo_u, hi_u = ev.agg(
        F.min("ms"), F.max("ms"), F.min("user_id"), F.max("user_id")) \
        .head()
    bits = 8
    qcols = [layout.quantize(F.col("user_id"), lo_u, hi_u + 1, bits=bits),
             layout.quantize(F.col("ms"), lo_ms, hi_ms + 1, bits=bits)]
    z_dir, h_dir = str(tmp_path / "z"), str(tmp_path / "h")
    layout.layout_zorder(ev, qcols, bits=bits, n_partitions=16) \
        .write.parquet(z_dir)
    layout.layout_hilbert(ev, qcols, bits=bits, n_partitions=16) \
        .write.parquet(h_dir)

    def fstats(fp, col):
        md = pq.ParquetFile(fp).metadata
        i = {md.schema.column(j).name: j
             for j in range(md.num_columns)}[col]
        return (min(md.row_group(g).column(i).statistics.min
                    for g in range(md.num_row_groups)),
                max(md.row_group(g).column(i).statistics.max
                    for g in range(md.num_row_groups)))

    def box_files(d, preds):
        n = 0
        for fp in glob.glob(d + "/*.parquet"):
            if all(not (fstats(fp, c)[1] < lo or fstats(fp, c)[0] > hi)
                   for c, lo, hi in preds):
                n += 1
        return n

    rng = random.Random(7)
    tz = th = 0
    for _ in range(20):
        ua = lo_u + (hi_u - lo_u) * rng.randint(0, 7) // 10
        ub = ua + (hi_u - lo_u) // rng.choice((4, 8, 16))
        ma = lo_ms + (hi_ms - lo_ms) * rng.randint(0, 7) // 10
        mb = ma + (hi_ms - lo_ms) // rng.choice((4, 8, 16))
        preds = [("user_id", ua, ub), ("ms", ma, mb)]
        tz += box_files(z_dir, preds)
        th += box_files(h_dir, preds)
    assert th <= tz, (f"Hilbert read MORE files than Morton on the "
                      f"fixed 20-box workload: hilbert={th} zorder={tz} "
                      f"— re-run the A/B and reconsider the option")


def test_hilbert_skilling_twin_matches_rotation_walk():
    """The two independent Hilbert derivations — the xy2d rotation walk
    (hilbert_py) and Skilling's transpose algorithm
    (hilbert_py_skilling) — agree on EVERY cell of the full grid at
    bits 1..6 (the gate's operating point is 6) and on random cells at
    bits=8. This equality is what the registry's kind='hilbert' oracle
    relies on."""
    import random
    for bits in range(1, 7):
        n = 1 << bits
        for x in range(n):
            for y in range(n):
                assert (layout.hilbert_py_skilling(x, y, bits)
                        == layout.hilbert_py(x, y, bits)), (bits, x, y)
    rng = random.Random(11)
    for _ in range(500):
        x, y = rng.randrange(256), rng.randrange(256)
        assert (layout.hilbert_py_skilling(x, y, 8)
                == layout.hilbert_py(x, y, 8))


def test_hilbert_nd_bijection_adjacency_and_2d_equality():
    """The n-D Skilling walk keeps the defining Hilbert properties in
    3-D (bits=3, 512 cells) and 4-D (bits=2, 256 cells): every index
    hit exactly once, and consecutive indices are GRID NEIGHBORS
    (one coordinate changes by exactly 1). Its 2-D instance equals
    both 2-D implementations."""
    for dims, bits in ((3, 3), (4, 2)):
        n = 1 << bits
        pos = {}

        def _walk(prefix):
            if len(prefix) == dims:
                d = layout.hilbert_py_nd(prefix, bits)
                assert d not in pos
                pos[d] = tuple(prefix)
                return
            for v in range(n):
                _walk(prefix + [v])
        _walk([])
        assert sorted(pos) == list(range(n ** dims))
        for d in range(n ** dims - 1):
            delta = [abs(a - b) for a, b in zip(pos[d], pos[d + 1])]
            assert sorted(delta) == [0] * (dims - 1) + [1], (dims, d)
    for x in range(16):
        for y in range(16):
            d = layout.hilbert_py_nd([x, y], 4)
            assert d == layout.hilbert_py(x, y, 4)
            assert d == layout.hilbert_py_skilling(x, y, 4)


def test_hilbert_decode_direction_is_exact_inverse():
    """INDEPENDENT n-D derivation gate (r10, r9 verdict item 4):
    `hilbert_axes_py_nd` implements the DECODE direction straight from
    the paper's primary code (TransposetoAxes: Gray decode first, undo
    sweep ascending) — no code shared with the encode walk. Full-grid
    inverse equality at 2-D/3-D/4-D plus seeded random samples up to
    8 bits certifies the two walks are mutually inverse constructions
    of the same curve; the registry's dedup_exact kind='hilbert_nd'
    oracle builds its lookup from THIS function. (A Butz/Hamilton
    entry-direction state walk was brute-force-checked over all 1152
    input-side conventions and is a DIFFERENT valid 3-D curve — the
    docstring records the negative result.)"""
    import random

    from itertools import product
    for dims, bits in ((2, 4), (3, 3), (4, 2)):
        for c in product(range(1 << bits), repeat=dims):
            h = layout.hilbert_py_nd(list(c), bits)
            assert layout.hilbert_axes_py_nd(h, bits, dims) == list(c)
        # and the other composition order: decode(h) re-encodes to h
        for h in range(1 << (dims * bits)):
            c = layout.hilbert_axes_py_nd(h, bits, dims)
            assert layout.hilbert_py_nd(c, bits) == h
    rng = random.Random(41)
    for dims, bits in ((2, 8), (3, 5), (4, 4), (5, 3)):
        for _ in range(400):
            c = [rng.randrange(1 << bits) for _ in range(dims)]
            h = layout.hilbert_py_nd(c, bits)
            assert layout.hilbert_axes_py_nd(h, bits, dims) == c


def test_layout_hilbert_3d_prunes_and_is_lossless(spark, sf_dir, tmp_path):
    """3-D Hilbert layout over (user, ms, value): reads back losslessly
    and prunes a 1-D user band from footers where a ts-sorted layout
    cannot; the lookup-size guard rejects over-resolved grids."""
    ev = load(spark, sf_dir, "events") \
        .filter(F.col("value").isNotNull()) \
        .select("event_id", "user_id", F.unix_millis("ts").alias("ms"),
                "value")
    lo_ms, hi_ms, lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("ms"), F.max("ms"), F.min("user_id"), F.max("user_id"),
        F.min("value"), F.max("value")).head()
    bits = 5                                   # 3 dims x 5 bits = 32k lut
    qcols = [layout.quantize(F.col("user_id"), lo_u, hi_u + 1, bits=bits),
             layout.quantize(F.col("ms"), lo_ms, hi_ms + 1, bits=bits),
             layout.quantize(F.col("value"), lo_v, hi_v + 1e-9,
                             bits=bits)]
    h_dir = str(tmp_path / "h3d")
    layout.layout_hilbert(ev, qcols, bits=bits, n_partitions=16) \
        .write.parquet(h_dir)
    got = spark.read.parquet(h_dir)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()

    u_a = lo_u + (hi_u - lo_u) * 2 // 10
    u_b = lo_u + (hi_u - lo_u) * 4 // 10
    total = hit = 0
    for fp in glob.glob(h_dir + "/*.parquet"):
        md = pq.ParquetFile(fp).metadata
        i = {md.schema.column(j).name: j
             for j in range(md.num_columns)}["user_id"]
        f_lo = min(md.row_group(g).column(i).statistics.min
                   for g in range(md.num_row_groups))
        f_hi = max(md.row_group(g).column(i).statistics.max
                   for g in range(md.num_row_groups))
        total += 1
        hit += (f_hi >= u_a and f_lo <= u_b)
    assert total >= 8 and hit < total

    with pytest.raises(ValueError, match="> 16"):
        layout.hilbert_lookup_nd(spark, bits=8, dims=3)
    with pytest.raises(ValueError, match=">= 2 dim"):
        layout.layout_hilbert(ev, [F.col("user_id")], bits=4)


def test_layout_hilbert_plan_broadcasts_lookup(spark, sf_dir):
    """The zkey->hkey lookup must ride a BROADCAST join — a silent
    regression to a shuffle join would add an exchange of the corpus
    on zkey just to map 65k grid cells."""
    ev = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", F.unix_millis("ts").alias("ms"))
    qcols = [layout.quantize(F.col("user_id"), 0, 1000, bits=6),
             layout.quantize(F.col("ms"), 0, 2_000_000_000_000, bits=6)]
    out = layout.layout_hilbert(ev, qcols, bits=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
