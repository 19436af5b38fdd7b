import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

from amazon_kinesis_replay_spark.session import build_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_spark("engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _proc_cpu_times():
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except OSError:
        return None


def run_load_sensitive(body, max_attempts: int = 3,
                       sleep_sec: float = 10.0,
                       retry_on: tuple = (AssertionError,)):
    """Run a timing-sensitive test body with the bench's own medicine
    (r11 verdict item 2): if the body's assertions fail AND the box
    read loaded over the attempt window (whole-window steal > 1% or
    load1 above the quiet band — bench.py's steal-proof thresholds),
    retry after a pause instead of failing the suite on co-tenant
    noise. A failure on a QUIET box (or on the last attempt) raises
    immediately — real regressions are never retried away silently;
    every retried attempt prints its meters so the log shows why."""
    for attempt in range(max_attempts):
        cpu0 = _proc_cpu_times()
        try:
            body()
            return
        except retry_on:
            cpu1 = _proc_cpu_times()
            steal = None
            if cpu0 is not None and cpu1 is not None:
                d = [b - a for a, b in zip(cpu0, cpu1)]
                steal = 100.0 * d[7] / (sum(d) or 1)
            try:
                load1 = float(open("/proc/loadavg").read().split()[0])
            except (OSError, ValueError):
                load1 = None
            loaded = ((steal is not None and steal > 1.0)
                      or (load1 is not None and load1 > 6.0))
            if attempt + 1 >= max_attempts or not loaded:
                raise
            print(f"[load-sensitive retry {attempt + 1}/{max_attempts}] "
                  f"attempt failed on a LOADED box "
                  f"(steal={steal}, load1={load1}); retrying",
                  file=sys.stderr)
            time.sleep(sleep_sec)
