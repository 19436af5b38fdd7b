"""Hadoop FileSystem helpers for index/state directories.

Index paths (MinHash/embedding/IVF state, streaming markers) may live on
HDFS or an object store, not the driver's local disk — `os.path` probes
are silently wrong there (always False, so every batch "bootstraps" and
discards history; see the round-6 ADVICE on `near_dup_stream`). These
helpers route every existence/list/rename through the JVM-side Hadoop
FileSystem resolved FOR the path's scheme, so the same code is correct on
file://, hdfs:// and s3a://.
"""

from __future__ import annotations


def _fs(spark, path: str):
    """(FileSystem, Path-class) pair for `path`'s scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def exists(spark, path: str) -> bool:
    """True iff `path` exists on its own filesystem (not the driver's)."""
    fs, jpath = _fs(spark, path)
    return bool(fs.exists(jpath(path)))


def delete(spark, path: str) -> None:
    """Recursive delete; no-op when absent."""
    fs, jpath = _fs(spark, path)
    fs.delete(jpath(path), True)


def rename(spark, src: str, dst: str) -> bool:
    """Filesystem rename (atomic on HDFS/local; copy on object stores)."""
    fs, jpath = _fs(spark, src)
    return bool(fs.rename(jpath(src), jpath(dst)))


def has_committed_output(spark, path: str) -> bool:
    """True iff `path` holds COMMITTED job output: the _SUCCESS marker,
    or at least one non-hidden file. A bare `exists()` is optimistic —
    a crashed write leaves the directory (with only _temporary/ inside)
    before the commit, and treating that as a complete table would make
    a bootstrap-completeness probe route to the incremental path against
    broken state."""
    fs, jpath = _fs(spark, path)
    d = jpath(path)
    if not fs.exists(d):
        return False
    if fs.exists(jpath(path + "/_SUCCESS")):
        return True
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def read_applied_batch(spark, path: str) -> int:
    """The applied-batch-id marker of an index directory (-1 when absent
    or unreadable) — the replay guard every index-backed incremental
    consults. One shared reader (r8 review: three copies had grown)."""
    try:
        row = spark.read.parquet(path + "/applied").head()
        return int(row["batch_id"]) if row is not None else -1
    except Exception:
        return -1


def write_text(spark, path: str, content: str) -> None:
    """Create/overwrite a small text file at `path` (manifests, markers)
    through the Hadoop FS API — correct on file://, hdfs://, s3a://."""
    fs, jpath = _fs(spark, path)
    out = fs.create(jpath(path), True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str):
    """Contents of a small text file, or None when absent."""
    fs, jpath = _fs(spark, path)
    p = jpath(path)
    if not fs.exists(p):
        return None
    ins = fs.open(p)
    try:
        jvm = spark._jvm
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(ins, baos, 4096, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        ins.close()


def listdir(spark, path: str) -> list[str]:
    """Names of the direct children of `path` (empty when absent) — on
    the PATH's filesystem, like every helper here."""
    fs, jpath = _fs(spark, path)
    d = jpath(path)
    if not fs.exists(d):
        return []
    return [st.getPath().getName() for st in fs.listStatus(d)]
