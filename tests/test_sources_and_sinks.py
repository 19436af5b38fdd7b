"""NDJSON source behaviors (codec autodetect, suffix skip, malformed drop)
and the batched/retried sink loop."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.config import ReplayConfig
from amazon_kinesis_replay_spark.sources import ndjson
from amazon_kinesis_replay_spark.streaming import sinks
from amazon_kinesis_replay_spark.tables import load


@pytest.fixture(scope="module")
def fixture_dir(spark, sf_dir, tmp_path_factory):
    """Reference-shaped NDJSON corpus (FIXTURES.md §2): plain + gz files,
    a README decoy, ~1% malformed timestamp lines."""
    root = tmp_path_factory.mktemp("ndjson")
    rows = (load(spark, sf_dir, "events")
            .select("event_id", "ts", "value")
            .orderBy("ts").collect())
    half = len(rows) // 2

    def line(r, malform=False):
        ts = "not-a-timestamp" if malform else r["ts"].isoformat()
        return json.dumps({"event_id": r["event_id"],
                           "dropoff_datetime": ts,
                           "value": r["value"]})

    n_malformed = 0
    with open(root / "part-000.json", "w") as fh:
        for i, r in enumerate(rows[:half]):
            malform = i % 100 == 7
            n_malformed += malform
            fh.write(line(r, malform) + "\n")
    with gzip.open(root / "part-001.json.gz", "wt") as fh:
        for r in rows[half:]:
            fh.write(line(r) + "\n")
    (root / "README.md").write_text("decoy: not data\n")
    return str(root), len(rows), n_malformed


def test_read_events_full_pipeline(spark, fixture_dir):
    path, n_total, n_malformed = fixture_dir
    cfg = ReplayConfig(source_path=path)  # default attr dropoff_datetime,
    out = ndjson.read_events(spark, cfg)  # default suffix skip README.md
    got = out.count()
    assert got == n_total - n_malformed  # decoy + malformed rows dropped
    assert out.schema["ts"].dataType.typeName().startswith("timestamp")
    # both files read (gz decompressed): event span covers both halves
    assert out.agg(F.min("ts"), F.max("ts")).collect()[0][1] is not None


def test_suffix_skip_is_exact(spark, fixture_dir):
    path, n_total, n_malformed = fixture_dir
    cfg = ReplayConfig(source_path=path, object_suffix_to_skip="")
    out = ndjson.read_events(spark, cfg)
    # README decoy line fails timestamp parse anyway -> same count, but the
    # suffix filter must prune the FILE, not rely on parse failure:
    pruned = ndjson.read_events(
        spark, ReplayConfig(source_path=path))
    assert out.count() == pruned.count() == n_total - n_malformed


def test_bz2_and_corrupt_files(spark, tmp_path):
    """OP-SRC-DECOMP (.bz2) + OP-SRC-SKIPBAD (corrupt archive skipped
    without failing the scan)."""
    import bz2 as bz2lib
    root = tmp_path / "mixed"
    root.mkdir()
    with bz2lib.open(root / "good.json.bz2", "wt") as fh:
        for i in range(20):
            fh.write(json.dumps({"dropoff_datetime":
                                 f"2024-01-01T00:00:{i:02d}"}) + "\n")
    # truncated gz: a valid header then garbage -> decompressor error
    (root / "bad.json.gz").write_bytes(b"\x1f\x8b\x08\x00garbage-not-gz")
    cfg = ReplayConfig(source_path=str(root))
    out = ndjson.read_events(spark, cfg)
    assert out.count() == 20


def test_kinesis_source_is_gated(spark):
    """Without a connector on the classpath the Kinesis source raises
    NotImplementedError with packaging guidance (never a cryptic py4j
    error)."""
    from amazon_kinesis_replay_spark.sources.kinesis import read_kinesis_stream
    cfg = ReplayConfig(
        stream_arn="arn:aws:kinesis:us-east-1:123456789012:stream/x")
    with pytest.raises(NotImplementedError, match="connector"):
        read_kinesis_stream(spark, cfg)


def test_send_with_retry_failed_subset():
    cfg = ReplayConfig(backoff_base_ms=1, max_backoff_ms=2)
    # request 0 fails records 1 and 3; request 1 (the retry of those 2)
    # fails record 0; request 2 succeeds.
    sink = sinks.InMemorySink(fail_plan={0: [1, 3], 1: [0]})
    records = [{"payload": f"p{i}"} for i in range(5)]
    naps = []
    stats = sinks.send_with_retry(sink, records, cfg, sleep=naps.append)
    assert stats.requests == 3
    assert stats.records_sent == 5
    assert stats.retried_records == 3  # 2 retried once + 1 retried twice
    sent = [r["payload"] for b in sink.batches for r in b]
    assert sorted(sent) == [f"p{i}" for i in range(5)]
    # exponential backoff: min(2, 2^a*1) ms
    assert naps == [0.002, 0.002]


def test_send_with_retry_exhaustion():
    cfg = ReplayConfig(max_retries=3, backoff_base_ms=1, max_backoff_ms=1)
    sink = sinks.InMemorySink(fail_plan={i: [0] for i in range(10)})
    with pytest.raises(sinks.SinkError):
        sinks.send_with_retry(sink, [{"payload": "x"}], cfg, sleep=lambda s: None)


def test_chunked_500():
    chunks = list(sinks.chunked(list(range(1201)), 500))
    assert [len(c) for c in chunks] == [500, 500, 201]
