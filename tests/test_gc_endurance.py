"""Long-lifecycle GC endurance witness (r10 — the r9 verdict's #5 ask).

`fsutil.gen_gc` is crash-tested per-family in test_gen_layout.py; this
module drives the COMPOSED long-run contract: N cycles of
append -> retrain/compaction across all four generation-pointer index
families (IVF x SQ8, semantic, BM25 retrieval, substring windows),
asserting after EVERY cycle that

- on-disk committed generations stay retention-bounded (<= keep=2),
- NOTHING on disk lives outside the live generations except a small
  fixed set of root aux entries (meta/applied markers): superseded
  generations and folded deltas are actually collected, so the
  footprint is (content of <= 2 generations) + O(1) — content growth
  is append-driven by design, never cycle-count-driven (a generation
  leak would show up as stray gen dirs or files outside the live set),
- a reader pinned via gen_resolve on the PREVIOUS cycle's generation
  still collects after the next rebuild (the keep=2 in-flight-reader
  contract, re-proven at every cycle, not just once),
- the query paths keep answering throughout.

Reference parity note: the reference engine
(aws-samples/amazon-kinesis-replay) holds no persistent index state;
this witnesses the repo's index-lifecycle extension surface.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark import fsutil
from amazon_kinesis_replay_spark.operators import dedup, retrieval, similarity
from amazon_kinesis_replay_spark.tables import load

pytestmark = pytest.mark.slow       # ~2.5 min composed lifecycle witness

N_CYCLES = 4


def _count_files(root: str) -> int:
    n = 0
    for _dir, _subs, files in os.walk(root):
        n += len(files)
    return n


#: root-level entries that legitimately live OUTSIDE generation dirs:
#: stats/markers written once (or per batch, bounded by the applied
#: marker contract), never per-generation.
_AUX_OK = {"meta", "applied", "folded_max.txt", "_SUCCESS"}


def _stray_entries(path: str) -> list[str]:
    """Top-level entries that are neither generation dirs nor known aux
    entries — a non-empty result means the GC leaked something."""
    out = []
    for name in os.listdir(path):
        if name.startswith("gen=") or name in _AUX_OK:
            continue
        out.append(name)
    return out


def _committed_gens(spark, path: str) -> list[int]:
    return [n for n, _name, committed in fsutil.gen_list(spark, path)
            if committed]


def test_gc_endurance_four_families(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb200 = emb.limit(200).localCheckpoint()
    docs200 = docs.limit(200).localCheckpoint()

    ivf = str(tmp_path / "ivfsq")
    sem = str(tmp_path / "sem")
    bm = str(tmp_path / "bm25")
    sub = str(tmp_path / "substr")
    similarity.ivf_sq_index_write(emb200, ivf, n_centroids=4)
    # n_assign=2: the v2 (multi-row-member) format runs the full
    # generation lifecycle — retrains must preserve the width (r13)
    similarity.semantic_index_write(emb200, sem, n_centroids=4,
                                    n_assign=2)
    retrieval.retrieval_index_write(docs200, bm)
    dedup.substring_index_write(docs200, sub, window=12)

    paths = {"ivfsq": ivf, "sem": sem, "bm25": bm, "substr": sub}
    steady: dict[str, int] = {}
    pinned: dict[str, tuple] = {}      # family -> (gen_dir, lazy reader)
    q_vec = emb200.select(F.col("embedding").alias("q_vec")).limit(1) \
        .localCheckpoint()

    for c in range(1, N_CYCLES + 1):
        # --- appends (disjoint ids per cycle, cost ∝ batch) ---
        new_emb = emb200.limit(10).select(
            (F.col("vec_id") + 10000 * c).alias("vec_id"), "embedding")
        similarity.ivf_sq_index_append(spark, new_emb, ivf)
        new_docs = docs200.limit(20).select(
            (F.col("doc_id") + 10000 * c).alias("doc_id"), "text")
        retrieval.retrieval_index_append(new_docs, bm, batch_id=c)
        dedup.duplicate_spans_incremental(spark, new_docs, sub,
                                          delta_name=f"c{c}").count()
        # the incremental result's read-barrier dataset is consumed —
        # release it (the documented per-batch lifecycle; a driver that
        # skips this leaks one staging dataset per batch forever)
        dedup.clear_staging(spark, sub)

        # --- rebuild / compaction (each publishes a new generation) ---
        assert similarity.ivf_sq_index_maybe_retrain(
            spark, ivf, growth_threshold=-1.0)
        assert similarity.semantic_index_maybe_retrain(
            spark, sem, growth_threshold=-1.0)
        retrieval.retrieval_index_compact(spark, bm)
        dedup.substring_index_compact(spark, sub)

        for fam, path in paths.items():
            gens = _committed_gens(spark, path)
            # retention bound: never more than keep=2 committed gens
            assert 1 <= len(gens) <= 2, (fam, c, gens)
            # generations advance monotonically — c rebuilds so far
            assert max(gens) == c, (fam, c, gens)

            # the reader pinned LAST cycle survived this cycle's GC
            if fam in pinned:
                gen_dir, reader, n_rows = pinned[fam]
                assert fsutil.exists(spark, gen_dir), (fam, c)
                assert reader.count() == n_rows, (fam, c)
            # pin this cycle's generation for the next one
            gen_dir = fsutil.gen_current(spark, path)
            subdir = {"ivfsq": "/codes", "sem": "/members",
                      "bm25": "/postings", "substr": "/wins"}[fam]
            reader = spark.read.parquet(gen_dir + subdir)
            pinned[fam] = (gen_dir, reader, reader.count())

            # footprint invariant: nothing outside the live generation
            # dirs but the fixed aux entries (no leaked superseded
            # generations, no orphaned delta/staging dirs), and at most
            # keep=2 committed + 0 uncommitted gen dirs at rest
            assert _stray_entries(path) == [], (fam, c,
                                                _stray_entries(path))
            gen_dirs = [e for e in os.listdir(path)
                        if e.startswith("gen=")]
            assert len(gen_dirs) <= 2, (fam, c, gen_dirs)
            # content growth is append-driven: once BOTH retention
            # slots are filled (cycle 2 legitimately doubles the
            # footprint — keep=2 holds two full generations), per-cycle
            # growth is bounded by a constant x the appended batch,
            # never another full index copy
            n_files = _count_files(path)
            if c >= 3:
                prev = steady.get(fam, n_files)
                assert n_files <= prev + 120, (fam, c, n_files, prev)
            steady[fam] = n_files

        # --- the query paths answer mid-lifecycle ---
        assert similarity.ivf_sq_probe_topk(
            spark, ivf, q_vec, k=3, n_probe=4).count() == 3
        sample_tok = (docs200.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+"))
            .alias("t")).filter(F.length("t") > 0).limit(1)
            .head()["t"])
        assert retrieval.bm25_topk_indexed(spark, bm, sample_tok,
                                           k=3).count() > 0

    # endurance summary: every family ended at cycle N with <= 2
    # committed generations and a steady-state footprint
    for fam, path in paths.items():
        gens = _committed_gens(spark, path)
        assert max(gens) == N_CYCLES and len(gens) <= 2, (fam, gens)

    # v2 format survived every retrain: width still recorded, members
    # still one row per assigned cell (2x the vector count)
    sem_gen = fsutil.gen_current(spark, sem)
    assert spark.read.parquet(sem_gen + "/meta").head()["n_assign"] == 2
    m = spark.read.parquet(sem_gen + "/members")
    assert m.count() == 2 * m.filter("assign_rank = 1").count()
