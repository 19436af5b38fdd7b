"""Bucketed-table helpers: shuffle-free co-located joins at steady state.

The 100 TB pattern for repeatedly-joined fact tables: write both sides
bucketed (and sorted) by the join key once; every subsequent sort-merge
join reads co-located buckets and plans with NO exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8, sort: bool = True) -> None:
    """Persist df as a bucketed (+sorted) managed table on the join key."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def co_located_join(spark: SparkSession, left_table: str, right_table: str,
                    left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys with a merge
    hint — with matching bucketing this plans as an exchange-free
    sort-merge join.

    When the key NAMES match (the normal bucketed case), the join uses
    the name form so the output carries ONE coalesced key column — the
    expression form would keep two identically-named columns and make
    the key unreferenceable downstream (AMBIGUOUS_REFERENCE on any later
    select/groupBy; r7 review)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    if left_key == right_key:
        return left.join(right, on=[left_key])
    return left.join(right, left[left_key] == right[right_key])
