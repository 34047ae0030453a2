"""Filesystem probes for cross-batch state generations, resolved
through the Hadoop FileSystem API instead of ``os.path`` — the state
stores live wherever the landing does (local, HDFS, S3A, ...), and a
``os.path.exists`` probe against a non-local URI silently reads as
"absent", which would reset an evolving state (global offset,
perceptron weights) to its zero generation and corrupt every
downstream landing WITHOUT a failure.  With the FS API the probe is
answered by the same filesystem the write went to, so a missing-state
fallback only triggers when the generation genuinely does not exist.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS ``exists`` — works for any scheme Spark can write."""
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names (last path component) of ``path`` — the FS-API
    analogue of ``os.listdir``."""
    fs, p = _fs_and_path(spark, path)
    return [str(st.getPath().getName()) for st in fs.listStatus(p)]


def _active(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "hadoopfs helpers need a SparkSession (the Hadoop FileSystem "
            "API lives in the JVM); start one or pass spark= explicitly"
        )
    return s


def fs_read_text(path: str, spark: SparkSession | None = None) -> str | None:
    """Full text of a small metadata object, or ``None`` if absent —
    the pointer/manifest read primitive.  Never used for data files.
    The copy runs JVM-side (IOUtils → ByteArrayOutputStream, one py4j
    transfer of the final byte[]), not a per-byte gateway loop."""
    s = _active(spark)
    fs, p = _fs_and_path(s, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        bos = s._jvm.java.io.ByteArrayOutputStream()
        s._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            stream, bos, s._jsc.hadoopConfiguration(), False
        )
        return bytes(bos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def fs_write_text_atomic(
    path: str, text: str, spark: SparkSession | None = None
) -> None:
    """Atomic small-object write: create ``path.tmp-*`` then
    FileContext overwrite-rename (the same primitive Spark's own
    HDFSMetadataLog commits with) — a reader sees the OLD complete
    object or the NEW complete object, never a partial one."""
    s = _active(spark)
    jvm = s._jvm
    conf = s._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    fs, tp = _fs_and_path(s, tmp)
    out = fs.create(tp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(P(path).toUri(), conf)
    ren = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
    arr = s.sparkContext._gateway.new_array(ren, 1)
    arr[0] = ren.OVERWRITE
    fc.rename(tp, P(path), arr)


def fs_publish_exclusive(
    path: str, text: str, spark: SparkSession | None = None
) -> bool:
    """Atomic publish-if-absent: write a unique tmp sibling, then
    rename WITHOUT overwrite.  Returns False (tmp cleaned up) when
    ``path`` already exists — the loser of a concurrent publish race
    detects it and can retry under a new name.  Atomic on POSIX/HDFS
    rename semantics; on S3A the no-overwrite check is check-then-act
    (the documented object-store caveat — use a conditional PUT there)."""
    s = _active(spark)
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    fs, tp = _fs_and_path(s, tmp)
    out = fs.create(tp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    _, dp = _fs_and_path(s, path)
    if fs.rename(tp, dp):
        return True
    fs.delete(tp, False)
    return False


def fs_delete(path: str, recursive: bool = True, spark: SparkSession | None = None) -> bool:
    """Delete a file or directory tree; False if it did not exist."""
    fs, p = _fs_and_path(_active(spark), path)
    return bool(fs.delete(p, recursive))


def fs_rename(path: str, dst: str, spark: SparkSession | None = None) -> bool:
    """Plain no-overwrite rename (False when ``dst`` exists)."""
    s = _active(spark)
    fs, p = _fs_and_path(s, path)
    _, d = _fs_and_path(s, dst)
    return bool(fs.rename(p, d))


def fs_mkdirs(path: str, spark: SparkSession | None = None) -> None:
    fs, p = _fs_and_path(_active(spark), path)
    fs.mkdirs(p)


def fs_is_dir(path: str, spark: SparkSession | None = None) -> bool:
    fs, p = _fs_and_path(_active(spark), path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def fs_list(path: str, spark: SparkSession | None = None) -> list[str]:
    """Child basenames of ``path`` ([] when absent) — keyword-spark
    variant of :func:`fs_list_names` for callers that resolve the
    active session."""
    s = _active(spark)
    fs, p = _fs_and_path(s, path)
    if not fs.exists(p):
        return []
    return [str(st.getPath().getName()) for st in fs.listStatus(p)]


def fs_list_entries(
    path: str, spark: SparkSession | None = None
) -> list[tuple[str, bool]]:
    """(basename, is_dir) pairs from ONE listStatus call ([] when
    absent) — the per-child type is already in the FileStatus, so
    listing loops never pay a second JVM round-trip per child (the
    O(partitions) warehouse scans use this)."""
    s = _active(spark)
    fs, p = _fs_and_path(s, path)
    if not fs.exists(p):
        return []
    return [
        (str(st.getPath().getName()), bool(st.isDirectory()))
        for st in fs.listStatus(p)
    ]
