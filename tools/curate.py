#!/usr/bin/env python
"""End-to-end training-data curation driver — the complete pipeline a
100 TB corpus runs, composed from the engine's operators:

  1. quality + repetition signals      (text.quality_features profile)
  2. n-gram LM fit scoring             (ngram_lm_counts/ngram_lm_score)
  3. PII redaction                     (text.pii_redact)
  4. near-dup detection (MinHash-LSH)  (dedup.minhash_dedup)
  5. clustering, KEEP THE BEST copy    (dedup.dedup_clusters(quality=))
  6. deterministic split + decontam    (hash split + cross_split_contamination)
  7. BPE tokenize to ids               (text.bpe_train/bpe_vocab/bpe_encode)
  8. sequence packing                  (text.pack_sequences)
  9. sharded export                    (export.write_training_shards)

Usage: python tools/curate.py [sf_dir] [out_dir]

Prints per-stage progress and ONE final JSON summary line (doc counts
in/out per stage, shard layout). Every stage is the same operator the
oracle gate checks — this driver only composes them.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curate-out-")
    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark import export
    from amazon_kinesis_replay_spark.operators import dedup, text
    from amazon_kinesis_replay_spark.session import build_spark
    from amazon_kinesis_replay_spark.tables import load

    spark = build_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    summary: dict = {"sf_dir": sf_dir, "out_dir": out_dir}

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    summary["docs_in"] = docs.count()

    # 1-2: quality profile + LM fit -> one combined quality score
    qf = text.quality_features(docs, "doc_id", "text")
    lm = text.ngram_lm_counts(docs, "text", n=2)
    lmscore = text.ngram_lm_score(docs, "doc_id", "text", lm, n=2)
    quality = (qf.join(lmscore.select("doc_id", "bits_per_token"),
                       "doc_id", "left")
               .select("doc_id",
                       (F.col("quality_score")
                        - F.coalesce(F.col("bits_per_token"), F.lit(0.0))
                        / F.lit(64.0)).alias("score")).persist())
    quality.count()
    print(f"[1-2] quality+LM scored {summary['docs_in']} docs", flush=True)

    # 3: PII redaction (clean_text replaces text downstream)
    red = text.pii_redact(docs, "doc_id", "text").persist()
    summary["docs_redacted"] = red.filter("n_redactions > 0").count()
    print(f"[3] redacted {summary['docs_redacted']} docs", flush=True)

    # 4-5: near-dup pairs -> clusters -> keep best-quality representative
    pairs = dedup.minhash_dedup(docs, "doc_id", "text",
                                num_hashes=32, bands=16, k=3,
                                threshold=0.5)
    clusters = dedup.dedup_clusters(docs, pairs, "doc_id",
                                    check_every=2, quality=quality)
    keep = clusters.filter("is_representative").select("doc_id")
    summary["docs_after_dedup"] = keep.count()
    summary["dup_docs_dropped"] = (summary["docs_in"]
                                   - summary["docs_after_dedup"])
    print(f"[4-5] dedup kept {summary['docs_after_dedup']} "
          f"(dropped {summary['dup_docs_dropped']})", flush=True)

    kept = (red.join(keep, "doc_id")
            .select("doc_id", F.col("clean_text").alias("text")).persist())
    kept.count()

    # 6: deterministic split + decontamination of eval against train
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100)) \
        .cast("long")
    split = kept.withColumn(
        "split", F.when(bucket < 90, "train").otherwise("valid"))
    cont = dedup.cross_split_contamination(split, "doc_id", "text",
                                           "split", k=3)
    clean = (split.join(cont.select(F.col("id").alias("doc_id"),
                                    "contaminated"), "doc_id")
             .filter(~F.col("contaminated")).persist())
    summary["eval_contaminated_dropped"] = (
        summary["docs_after_dedup"] - clean.count())
    print(f"[6] decontamination dropped "
          f"{summary['eval_contaminated_dropped']} eval docs", flush=True)

    # 7: BPE tokenize to ids (trained on the SURVIVING train split)
    merges = text.bpe_train(clean.filter("split = 'train'"), "text",
                            n_merges=64)
    vocab = text.bpe_vocab(clean, "text", merges)
    enc = text.bpe_encode(clean, "text", merges, vocab=vocab)
    summary["vocab_size"] = len(vocab)

    # 8-9: pack and export
    packed = text.pack_sequences(enc, "doc_id", "bpe_tokens_count",
                                 seq_len=512)
    staged = packed.select("doc_id", "split", "pack_id",
                           "bpe_tokens_count", "bpe_tokens_ids")
    export.write_training_shards(staged, out_dir + "/shards",
                                 rows_per_shard=100_000)
    back = spark.read.parquet(out_dir + "/shards")
    summary["docs_exported"] = back.count()
    summary["total_tokens"] = back.agg(
        F.sum("bpe_tokens_count")).head()[0]
    summary["n_packs"] = back.select("split", "pack_id").distinct().count()
    summary["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary), flush=True)
    if len(sys.argv) <= 2:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
