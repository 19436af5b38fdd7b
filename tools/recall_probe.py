#!/usr/bin/env python
"""Candidate-recall probe for the LSH parameter choices.

Measures, against EXACT ground truth at a small SF:
- MinHash banding: candidate recall of (num_hashes, bands x rows)
  configurations at the verified Jaccard threshold (the 32-hash 16x2
  default must keep recall 1.0 on the fixture; 64-hash 32x2 is the r3
  config it replaced at twice the cost; 64-hash 16x4 is the r2 config
  whose boundary recall was fixture-dependent), plus the candidate count
  (cost proxy — wider bands admit more false positives for the exact
  verify step to discard).
- Embedding sign-LSH banding: recall of banded candidates vs the exact
  all-pairs cosine>=t set for (n_bands, band_bits) splits of the 64 dims.

Usage: python tools/recall_probe.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import numpy as np
    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark.operators import dedup
    from amazon_kinesis_replay_spark.session import build_spark
    from amazon_kinesis_replay_spark.tables import load

    spark = build_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- MinHash banding vs exact Jaccard ---------------------------------
    d = load(spark, sf_dir, "documents")
    truth = {(r["id_a"], r["id_b"]) for r in
             dedup.ngram_jaccard_pairs(d, "doc_id", "text", 3, 0.5).collect()}
    print(f"minhash truth: {len(truth)} pairs at J>=0.5 ({sf_dir})",
          flush=True)
    for num_hashes, bands in ((64, 16), (64, 32), (32, 16)):
        rows = num_hashes // bands
        cand = {(r["id_a"], r["id_b"]) for r in
                dedup.minhash_lsh_pairs(d, "doc_id", "text",
                                        num_hashes=num_hashes, bands=bands,
                                        k=3).collect()}
        hit = len(cand & truth)
        rec = hit / len(truth) if truth else 1.0
        tag = " (default)" if (num_hashes, bands) == (32, 16) else ""
        print(f"  {num_hashes}h {bands:2d}x{rows}: recall {rec:6.4f} "
              f"({hit}/{len(truth)}), {len(cand)} candidates{tag}",
              flush=True)

    # ---- Embedding sign-LSH banding vs exact cosine -----------------------
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    rows_ = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows_]
    V = np.array([r["embedding"] for r in rows_], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    sims = (V @ V.T) / np.outer(norms, norms)
    iu, ju = np.triu_indices(len(ids), k=1)
    thresh = 0.4
    exact = {(min(ids[i], ids[j]), max(ids[i], ids[j]))
             for i, j in zip(iu[sims[iu, ju] >= thresh],
                             ju[sims[iu, ju] >= thresh])}
    print(f"embedding truth: {len(exact)} pairs at cos>={thresh}",
          flush=True)
    signs = V >= 0
    n_vecs = len(ids)
    for n_bands, band_bits in ((8, 8), (16, 4), (4, 16)):
        got = set()
        for i, j in zip(iu, ju):
            if sims[i, j] < thresh:
                continue
            for b in range(n_bands):
                lo, hi = b * band_bits, (b + 1) * band_bits
                if (signs[i, lo:hi] == signs[j, lo:hi]).all():
                    a_, b_ = ids[i], ids[j]
                    got.add((min(a_, b_), max(a_, b_)))
                    break
        rec = len(got) / len(exact) if exact else 1.0
        # Cost proxy (r6 ROADMAP candidate): quadratic verify work is
        # confined to band buckets, so the MAX bucket share witnesses the
        # N^2-confinement claim per config, and sum C(size,2) over all
        # buckets is the candidate-pair cost the exact verify must absorb.
        cand_pairs = 0
        max_bucket = 0
        for b in range(n_bands):
            lo = b * band_bits
            key = signs[:, lo:lo + band_bits] @ (
                1 << np.arange(band_bits, dtype=np.int64))
            _, counts = np.unique(key, return_counts=True)
            max_bucket = max(max_bucket, int(counts.max()))
            cand_pairs += int((counts * (counts - 1) // 2).sum())
        print(f"  {n_bands:2d} bands x {band_bits:2d} bits: "
              f"recall {rec:6.4f} ({len(got)}/{len(exact)}); "
              f"max bucket {max_bucket}/{n_vecs} "
              f"({max_bucket / n_vecs:.3f} share), "
              f"{cand_pairs} candidate pairs", flush=True)

    # ---- ANN family: recall@10 + wall time vs the exact baseline ----------
    import tempfile
    import time

    from amazon_kinesis_replay_spark.operators import similarity as S
    full = load(spark, sf_dir, "embeddings")
    queries = [0, 100, 250]
    qdfs = [(qid, full.filter(F.col("vec_id") == qid)
             .select(F.col("embedding").alias("q_vec"))) for qid in queries]
    truth = {qid: [r["vec_id"] for r in
                   S.brute_force_topk(full, qdf, k=10).collect()]
             for qid, qdf in qdfs}

    cents = S.kmeans_centroids(full, n_centroids=8, n_iters=2)
    cb = S.pq_train(full, n_subs=8, n_codes=16, n_iters=2)
    codes = S.pq_encode(full, cb)
    tmp = tempfile.mkdtemp(prefix="ann-probe-")
    S.ivf_pq_index_write(full, tmp + "/ivfpq", n_centroids=8,
                         n_subs=8, n_codes=16)
    S.ivf_sq_index_write(full, tmp + "/ivfsq", n_centroids=8)

    variants = {
        "lsh(4bit)": lambda qdf: S.lsh_topk(full, qdf, k=10),
        # multi-probe (r8): +1 / +3 least-confident-bit neighbor buckets —
        # recall at 2x / 4x the scanned fraction, still bucket-pruned
        "lsh(4bit,p2)": lambda qdf: S.lsh_topk(full, qdf, k=10, n_probe=2),
        "lsh(4bit,p4)": lambda qdf: S.lsh_topk(full, qdf, k=10, n_probe=4),
        # perturbation sequences (r8 late): multi-bit flip sets ordered by
        # the Lv et al. expected-score proxy — same scanned fraction as
        # the single-bit run above at p4, deeper probing available beyond
        # the n_bits+1 single-bit ceiling
        "lsh(4bit,p4,f2)": lambda qdf: S.lsh_topk(full, qdf, k=10,
                                                  n_probe=4, max_flip=2),
        "lsh(4bit,p8,f2)": lambda qdf: S.lsh_topk(full, qdf, k=10,
                                                  n_probe=8, max_flip=2),
        "ivf(8c,2p)": lambda qdf: S.ivf_topk(full, qdf, k=10, n_centroids=8,
                                             n_probe=2, centroids=cents),
        "pq(8x16,r4)": lambda qdf: S.pq_topk(full, qdf, k=10, codebooks=cb,
                                             codes=codes),
        "ivfpq(8c,4p,r8)": lambda qdf: S.ivf_pq_probe_topk(
            spark, tmp + "/ivfpq", qdf, k=10, n_probe=4, rerank_factor=8),
        # SQ8 (r8 3rd continuation): full scan of 1/4-width codes +
        # exact rescore — recall should sit at ~1.0 (8-bit codes rank
        # tightly); the lever is bytes-per-row, not rows scanned
        "sq8(r2)": lambda qdf: S.sq8_topk(full, qdf, k=10,
                                          rerank_factor=2),
        "sq8(r4)": lambda qdf: S.sq8_topk(full, qdf, k=10),
        # IVF x SQ8 composed index: 2-of-8 list pruning x 1/4-width
        # code rows + exact rescore — both byte levers at once
        "ivfsq(8c,2p,r4)": lambda qdf: S.ivf_sq_probe_topk(
            spark, tmp + "/ivfsq", qdf, k=10, n_probe=2),
    }
    print(f"ANN recall@10 over queries {queries} ({sf_dir}):", flush=True)
    for name, fn in variants.items():
        hits = n_ret = 0
        t0 = time.monotonic()
        for qid, qdf in qdfs:
            got = [r["vec_id"] for r in fn(qdf).collect()]
            hits += len(set(got) & set(truth[qid]))
            n_ret += 10
        dt = time.monotonic() - t0
        print(f"  {name:16s}: recall {hits / n_ret:5.2f} "
              f"({hits}/{n_ret}), {dt:5.2f}s for {len(queries)} queries",
              flush=True)

    # ---- Batched probe amortization (r9): one pruned scan for all
    # queries vs one scan per query — the number that justifies
    # ivf_sq_probe_topk_batch's existence is measured, not claimed
    seq_t0 = time.monotonic()
    seq = {}
    for qid, qdf in qdfs:
        seq[qid] = [r["vec_id"] for r in S.ivf_sq_probe_topk(
            spark, tmp + "/ivfsq", qdf, k=10, n_probe=2).collect()]
    seq_dt = time.monotonic() - seq_t0
    qb = full.filter(F.col("vec_id").isin(queries)).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("q_vec"))
    bat_t0 = time.monotonic()
    bat: dict = {}
    for r in S.ivf_sq_probe_topk_batch(spark, tmp + "/ivfsq", qb,
                                       k=10, n_probe=2).collect():
        bat.setdefault(int(r["query_id"]), []).append(r["vec_id"])
    bat_dt = time.monotonic() - bat_t0
    same = all(sorted(seq[q]) == sorted(bat[q]) for q in queries)
    print(f"ivfsq batched probe: {bat_dt:5.2f}s for {len(queries)} "
          f"queries vs {seq_dt:5.2f}s sequential "
          f"({seq_dt / max(bat_dt, 1e-9):.2f}x); results identical: "
          f"{same}", flush=True)

    # ---- SemDeDup epsilon sweep (dup mass / cluster-confinement cost) ----
    from amazon_kinesis_replay_spark.operators import similarity
    emb = load(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    asg = similarity.ivf_assign(
        emb, centroids=similarity.kmeans_centroids(
            emb, n_centroids=16, n_iters=2))
    sizes = [r["c"] for r in asg.groupBy("centroid_id")
             .agg(F.count("*").alias("c")).collect()]
    pair_cost = sum(c * (c - 1) // 2 for c in sizes)
    all_pairs = n_vec * (n_vec - 1) // 2
    print(f"SemDeDup cluster confinement ({sf_dir}): "
          f"max cluster share {max(sizes) / n_vec:.3f}, "
          f"within-cluster pairs {pair_cost} "
          f"({pair_cost / all_pairs:.3%} of all-pairs)", flush=True)
    # per-epsilon RECALL vs exact ground truth (r8 roadmap item): one
    # cluster = all-pairs = the exact dup set; the clustered marking is
    # a SUBSET of it by construction (a within-cluster qualifying pair
    # is also a global pair and min-id-wins only shrinks), so the only
    # error mode is MISSES across cluster boundaries — recall is the
    # entire quality story, precision is structurally 1.0.
    for eps in (0.3, 0.4, 0.5, 0.7):
        exact_ids = {r["id"] for r in similarity.semantic_dedup(
            emb, threshold=eps, n_centroids=1, n_iters=1)
            .filter("is_dup").collect()}
        got_ids = {r["id"] for r in similarity.semantic_dedup(
            emb, threshold=eps, n_centroids=16, n_iters=2)
            .filter("is_dup").collect()}
        got2_ids = {r["id"] for r in similarity.semantic_dedup(
            emb, threshold=eps, n_centroids=16, n_iters=2, n_assign=2)
            .filter("is_dup").collect()}
        assert got_ids <= got2_ids <= exact_ids, \
            "dup sets must nest: flat <= multi-assign <= exact"
        rec = len(got_ids) / len(exact_ids) if exact_ids else 1.0
        rec2 = len(got2_ids) / len(exact_ids) if exact_ids else 1.0
        print(f"  eps={eps:.1f}: {len(got_ids)}/{n_vec} marked "
              f"({len(got_ids) / n_vec:.1%}); exact {len(exact_ids)} "
              f"-> recall {rec:.3f} (n_assign=2: {rec2:.3f})",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
