#!/usr/bin/env python
"""Scale-linearity probe: run the MinHash dedup pipeline AND the
train/eval contamination pass over 1x / 4x / 10x synthetic expansions of
the documents corpus and report wall time. A near-linear curve is the
evidence the plans have no quadratic term: MinHash (explode -> min-aggs
-> band equi-join) vs the exact all-pairs Jaccard that would blow up
100x at 10x; contamination (shingle pass -> distinct train grams ->
semi-join) vs the train x eval doc-pair comparison a naive
implementation runs.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark.operators import dedup
    from amazon_kinesis_replay_spark.session import build_spark

    spark = build_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    results = []
    for mult in (1, 4, 10):
        # id-shifted copies with a perturbing token so copies are NOT exact
        # dups of each other (keeps bucket sizes realistic)
        parts = [base]
        for i in range(1, mult):
            parts.append(base.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" variant{i}")).alias("text")))
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionAll(p)
        n = corpus.count()
        t0 = time.monotonic()
        pairs = dedup.minhash_dedup(corpus, "doc_id", "text",
                                    num_hashes=64, bands=32, k=3,
                                    threshold=0.5).count()
        dt = time.monotonic() - t0
        results.append((mult, n, pairs, round(dt, 2)))
        print(f"x{mult}: {n} docs -> {pairs} pairs in {dt:.2f}s", flush=True)

    base_t = results[0][3]
    for mult, n, pairs, dt in results[1:]:
        print(f"x{mult} scaling factor: {dt / base_t:.2f} "
              f"(linear would be ~{mult})", flush=True)

    # ---- contamination pass over the same expansions -----------------------
    results = []
    for mult in (1, 4, 10):
        parts = [base]
        for i in range(1, mult):
            parts.append(base.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" variant{i}")).alias("text")))
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionAll(p)
        split = corpus.withColumn(
            "split", F.when(F.pmod(F.col("doc_id"), 10) < 8, "train")
            .otherwise("test"))
        n = split.count()
        t0 = time.monotonic()
        flagged = (dedup.cross_split_contamination(
            split, "doc_id", "text", "split")
            .filter("contaminated").count())
        dt = time.monotonic() - t0
        results.append((mult, n, flagged, round(dt, 2)))
        print(f"contamination x{mult}: {n} docs -> {flagged} flagged "
              f"in {dt:.2f}s", flush=True)
    base_t = results[0][3]
    for mult, n, flagged, dt in results[1:]:
        print(f"contamination x{mult} scaling factor: {dt / base_t:.2f} "
              f"(linear would be ~{mult})", flush=True)


if __name__ == "__main__":
    main()
