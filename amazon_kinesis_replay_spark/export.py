"""Training-data export: split-partitioned, uniformly-sized shards.

The last stage of the cleaning pipeline: after filtering, dedup,
decontamination, and sequence packing, the corpus ships as shard files a
training loader streams. Two failure modes matter at 100 TB — millions
of tiny files (listing/open overhead dominates) and multi-GB monsters
(no read parallelism, stragglers) — so the writer controls BOTH ends:
`repartition` bounds the file count from above (one writer task per
partition per split directory) and `maxRecordsPerFile` splits any
oversized task output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(df: DataFrame, path: str,
                          split_col: str = "split",
                          order_col: str | None = "pack_id",
                          rows_per_shard: int = 100_000,
                          n_tasks: int | None = None) -> None:
    """Write `df` as parquet shards partitioned by `split_col`
    (split=train/valid/test directories — a loader reads one directory,
    and Spark readers partition-prune on the split), with every file
    holding at most `rows_per_shard` rows.

    order_col (default pack_id): rows are clustered so each shard holds a
    contiguous range — repartitionByRange + sortWithinPartitions — which
    keeps one pack's documents inside one shard file (a training loader
    reads whole packs from single files) and makes shard contents
    deterministic given the data. Pass None for don't-care placement
    (plain hash repartition, one less sort)."""
    spark = df.sparkSession
    tasks = n_tasks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if order_col is not None:
        staged = (df.repartitionByRange(tasks, F.col(split_col),
                                        F.col(order_col))
                  .sortWithinPartitions(split_col, order_col))
    else:
        staged = df.repartition(tasks, F.col(split_col))
    (staged.write.mode("overwrite")
     .option("maxRecordsPerFile", rows_per_shard)
     .partitionBy(split_col)
     .parquet(path))
