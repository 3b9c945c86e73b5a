"""Small-file compaction for partitioned parquet layouts (the operational
pass every long-running 100 TB lake needs: streaming micro-batches and
per-epoch idempotent sinks leave thousands of KB-scale files per partition;
scan throughput dies on open/seek overhead long before bytes).

The reference's S3 writer batches uploads by count/size
(services/s3_writer — buffer flush thresholds) which bounds file count per
flush but not per partition-lifetime; this is the corresponding
maintenance job, Spark-native:

- **size-targeted**: output file count per partition =
  ceil(partition_bytes / target_bytes) — computed from the actual on-disk
  footprint, not row counts, so wide and narrow schemas both land near the
  target.
- **atomic per partition**: each partition directory is rewritten via the
  same write-new → swap pattern as `sources/reanchor.py` so readers never
  see a half-compacted partition.
- **scale shape**: driver work is one directory listing per partition
  (bounded metadata); the rewrite itself is a coalesce — a NARROW
  dependency, no shuffle: existing splits are concatenated, never
  re-partitioned by key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def partition_dirs(root: str) -> list[str]:
    """Leaf partition directories (Hive layout) under ``root`` — a leaf is
    any directory containing data files rather than only subdirectories."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _dir_stats(d: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for one partition directory."""
    n, b = 0, 0
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            n += 1
            b += os.path.getsize(os.path.join(d, f))
    return n, b


def compact_partition(
    spark: SparkSession, part_dir: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Rewrite one partition directory to ceil(bytes/target) files.

    Returns a stats dict.  The rewrite only fires when it at least HALVES
    the file count (hysteresis): recompaction changes the on-disk byte
    total (row groups merge, encodings improve), which can nudge the
    recomputed target below the file count just produced — without the 2×
    gain gate a blind scheduled sweep would rewrite the same partition
    every run.  With it, re-running compaction is a no-op."""
    n_files, n_bytes = _dir_stats(part_dir)
    want = max(1, -(-n_bytes // target_bytes))  # ceil
    if n_files < 2 * want:
        return {
            "dir": part_dir,
            "files_before": n_files,
            "files_after": n_files,
            "bytes": n_bytes,
            "rewritten": False,
        }
    df = spark.read.parquet(part_dir)
    tmp = part_dir + "__compact_tmp"
    # coalesce = narrow concatenation of existing splits; no shuffle
    df.coalesce(want).write.mode("overwrite").parquet(tmp)
    swap = part_dir + "__compact_old"
    os.rename(part_dir, swap)
    os.rename(tmp, part_dir)
    shutil.rmtree(swap)
    after, _ = _dir_stats(part_dir)
    return {
        "dir": part_dir,
        "files_before": n_files,
        "files_after": after,
        "bytes": n_bytes,
        "rewritten": True,
    }


def compact_tree(
    spark: SparkSession, root: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> list[dict]:
    """Compact every leaf partition under ``root``.  Partitions are
    independent — on a cluster this loop is embarrassingly parallel
    (one job per partition; ordering irrelevant, each swap atomic)."""
    return [compact_partition(spark, d, target_bytes) for d in partition_dirs(root)]
