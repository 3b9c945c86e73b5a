"""Atomic re-anchor swap (SURVEY §2.10 last row).

Reference: after a detected gap, the re-anchor service rebuilds order-book
state under temporary Redis keys and atomically RENAMEs them over the live
keys so readers never observe a half-built state
(docs/architecture/ARCHITECTURE.md:191-231; services/re_anchor_service/
README.md swap process).

Engine analog for a Parquet-backed table: write the rebuilt dataset to a
temp directory next to the live one, fsync-complete, then a single atomic
`os.rename` swap (two renames via a retirement dir, the classic
blue/green dataset flip).  Readers resolving the live path before the swap
keep reading the old snapshot (POSIX rename semantics); readers after see
only the new one.  On real object stores this maps to a manifest/pointer
flip (Delta/Iceberg commit) — same contract, different primitive.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame


def atomic_swap_write(df: DataFrame, live_dir: str) -> str:
    """Rebuild `live_dir` from `df` with an atomic cutover.

    Returns the retirement directory holding the previous snapshot (caller
    may delete it after verifying the new state — mirroring the reference's
    post-swap validation step).
    """
    parent = os.path.dirname(os.path.abspath(live_dir))
    stamp = str(int(time.time() * 1000))
    tmp_dir = os.path.join(parent, f".{os.path.basename(live_dir)}.build-{stamp}")
    old_dir = os.path.join(parent, f".{os.path.basename(live_dir)}.retired-{stamp}")

    df.write.mode("overwrite").parquet(tmp_dir)

    if os.path.exists(live_dir):
        os.rename(live_dir, old_dir)  # atomic: live → retired
    else:
        old_dir = ""
    try:
        os.rename(tmp_dir, live_dir)  # atomic: build → live
    except Exception:
        if old_dir:
            os.rename(old_dir, live_dir)  # roll back
        raise
    return old_dir


def retire(old_dir: str) -> None:
    if old_dir and os.path.exists(old_dir):
        shutil.rmtree(old_dir)
