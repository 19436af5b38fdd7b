"""Training-data export: split-partitioned, pack-aligned shards.

The last stage of the cleaning pipeline: after filtering, dedup,
decontamination, and sequence packing, the corpus ships as shard files a
training loader streams. Two failure modes matter at 100 TB — millions
of tiny files (listing/open overhead dominates) and multi-GB monsters
(no read parallelism, stragglers) — so the writer bounds shard size from
both ends; and one CORRECTNESS contract matters: a pack must never be
split across files (a loader reads whole packs from single files).
maxRecordsPerFile cannot honor that contract — it cuts writer output at
arbitrary row boundaries (r7 review caught a pack straddling every
rows_per_shard multiple) — so shard ids are assigned explicitly,
pack-aligned, with the same exclusive-cumsum-div rule sequence packing
itself uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(df: DataFrame, path: str,
                          split_col: str = "split",
                          order_col: str | None = "pack_id",
                          rows_per_shard: int = 100_000,
                          n_tasks: int | None = None,
                          shuffle_seed: int | None = None) -> None:
    """Write `df` as parquet shards under split=<v>/__shard=<k>/
    hive directories (readers partition-prune on both levels; a loader
    streams one split directory recursively).

    order_col (default pack_id): shard ids are assigned PACK-ALIGNED — a
    pack belongs to the shard its first row's running position lands in
    (exclusive cumsum div rows_per_shard, per split; the
    `pack_sequences` rule applied one level up), every row of a pack
    lands in the same shard directory, and each shard is written by one
    task as one file. Shards therefore hold at most rows_per_shard +
    (largest pack - 1) rows — the cap flexes ONLY to keep packs whole,
    and a single pack larger than the cap gets its own oversized shard
    rather than being torn. The cumsum is the range-bucketed distributed
    kernel, never a single-partition window, so assignment scales with
    the number of packs.

    shuffle_seed (late r8): training loaders want RANDOMIZED example
    order, and at 100 TB the right place to randomize is the export —
    shuffle once, stream shards sequentially forever. When set, packs
    are laid out in xxhash64(seed, order_col) order instead of
    order_col order: a deterministic, seed-reproducible global
    permutation OF WHOLE PACKS (rows within a pack stay contiguous —
    the pack-alignment contract is orthogonal to the order packs
    appear in), computed by the same distributed cumsum — no extra
    shuffle, no RNG state, different seeds give independent
    permutations and a rerun with the same seed is byte-identical.
    order_col itself tie-breaks hash collisions deterministically.

    Pass order_col=None for don't-care placement: plain hash
    repartition, flat split=<v>/ layout, maxRecordsPerFile as the hard
    per-file cap (no grouping contract to preserve)."""
    spark = df.sparkSession
    tasks = n_tasks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if order_col is not None:
        from .operators.replay_ops import with_global_cumsum
        if shuffle_seed is not None:
            okey = F.xxhash64(F.lit(int(shuffle_seed)).cast("long"),
                              F.col(order_col)).alias("__ord")
            order_keys = [split_col, "__ord", order_col]
        else:
            okey = F.col(order_col).alias("__ord")
            order_keys = [split_col, order_col]
        sizes = (df.groupBy(split_col, order_col)
                 .agg(F.count("*").alias("__n"))
                 .select(split_col, order_col, okey, "__n"))
        csum = with_global_cumsum(sizes, order_keys, "__n", "__cum")
        starts = csum.groupBy(split_col).agg(F.min("__cum").alias("__start"))
        assign = (csum.join(F.broadcast(starts), split_col)
                  .select(split_col, order_col, "__ord",
                          F.expr(f"(__cum - __start) div "
                                 f"{int(rows_per_shard)}").alias("__shard")))
        staged = (df.join(assign, [split_col, order_col])
                  .repartition(tasks, F.col(split_col), F.col("__shard"))
                  .sortWithinPartitions(split_col, "__ord", order_col)
                  .drop("__ord"))
        (staged.write.mode("overwrite")
         .partitionBy(split_col, "__shard")
         .parquet(path))
    else:
        staged = df.repartition(tasks, F.col(split_col))
        (staged.write.mode("overwrite")
         .option("maxRecordsPerFile", rows_per_shard)
         .partitionBy(split_col)
         .parquet(path))


def shard_manifest(spark, path: str) -> DataFrame:
    """Data-integrity manifest of an exported shard tree: one row per
    parquet file with its hive-derived (split, shard) and the row count
    read from the parquet FOOTER — never the data. The footer reads are
    DISTRIBUTED (file list parallelized, pyarrow per partition), so a
    100 TB export with ~10^5 shard files manifests in one metadata-scale
    job instead of a driver loop of sequential footer fetches.

    Use with `verify_shards`: persist the manifest next to the export at
    write time, re-derive later, and diff — missing / extra / resized
    files surface without scanning a byte of data."""
    files = [f for f in _walk_files(spark, path)
             if f.endswith(".parquet") and "/_manifest" not in f]

    def _footers(it):
        import pyarrow.parquet as pq
        for f in it:
            if f.startswith("file:"):
                # Hadoop renders local URIs as file:/x (single slash);
                # strip the scheme rather than round-trip through from_uri.
                md = pq.read_metadata(f[len("file:"):])
            elif "://" in f:
                # object-store / HDFS URI (the 100 TB scenario): resolve
                # the scheme to a pyarrow filesystem so the executor-side
                # footer read works off-local-disk too (r8 advice item).
                from pyarrow.fs import FileSystem
                fs, rel = FileSystem.from_uri(f)
                md = pq.read_metadata(rel, filesystem=fs)
            else:
                md = pq.read_metadata(f)
            yield (f, int(md.num_rows), int(md.serialized_size))

    sc = spark.sparkContext
    rows = sc.parallelize(files, max(1, min(len(files), 64))) \
        .mapPartitions(_footers)
    df = spark.createDataFrame(
        rows, "file string, n_rows long, footer_bytes long")
    part = F.regexp_extract("file", r"split=([^/]+)", 1).alias("split")
    shard = F.regexp_extract("file", r"__shard=([^/]+)", 1).alias("shard")
    return df.select(part, shard, "file", "n_rows", "footer_bytes")


def write_manifest(spark, path: str) -> None:
    """Snapshot `shard_manifest(path)` to <path>/_manifest (parquet —
    itself mergeable/queryable; excluded from future manifests)."""
    shard_manifest(spark, path).coalesce(1).write.mode("overwrite") \
        .parquet(path + "/_manifest")


def verify_shards(spark, path: str) -> dict:
    """Diff the persisted manifest against the CURRENT shard tree.
    Returns {'ok': bool, 'missing': [...], 'extra': [...],
    'changed': [...]} — a loader's preflight check that the export it is
    about to stream is exactly the export that was written (object-store
    eventual consistency, partial deletes, or a concurrent rewrite all
    surface here, from footers alone). The collects here are MANIFEST
    rows — one per shard file, metadata-scale by construction (the
    hygiene-test allowlist contract), never row data."""
    saved = {r["file"]: (r["n_rows"], r["footer_bytes"])
             for r in spark.read.parquet(path + "/_manifest").collect()}
    now = {r["file"]: (r["n_rows"], r["footer_bytes"])
           for r in shard_manifest(spark, path).collect()}
    missing = sorted(set(saved) - set(now))
    extra = sorted(set(now) - set(saved))
    # compare (n_rows, footer_bytes): a same-row-count rewrite still
    # perturbs the serialized footer, so 'resized'/corruption surfaces
    # even when the count is preserved (r8 advice item)
    changed = sorted(f for f in set(saved) & set(now)
                     if saved[f] != now[f])
    return {"ok": not (missing or extra or changed),
            "missing": missing, "extra": extra, "changed": changed}


def _walk_files(spark, path: str) -> list[str]:
    """Recursive file listing via the Hadoop FS API (works on any
    supported filesystem; directory-ness comes from FileStatus, never a
    name heuristic). Returns fully-qualified URIs."""
    from .fsutil import _fs
    fs, jpath = _fs(spark, path)
    root = jpath(path)
    if not fs.exists(root):
        return []
    out: list[str] = []
    stack = [root]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                out.append(st.getPath().toString())
    return out
