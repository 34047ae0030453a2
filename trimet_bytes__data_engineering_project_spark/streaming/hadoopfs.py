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
