#!/usr/bin/env python
"""Dump .explain('formatted') for registry queries to plans/r13/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]   (default: bench headline)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_kinesis_replay_spark.plans import QUERIES  # noqa: E402
from amazon_kinesis_replay_spark.session import build_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q14_promo_effect", "agg_events_by_type", "window_rate_stats",
    "order_by_event_time", "batch_assignment", "replay_plan",
    "ngram_jaccard_dedup", "minhash_dedup", "ann_topk_cosine",
    "doc_text_profile", "doc_train_split", "dedup_embedding_cosine",
    "training_data_pipeline",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
