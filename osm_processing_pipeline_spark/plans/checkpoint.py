"""Per-partition-range checkpointing with lineage + row-count metrics.

The reference pipeline restarts by re-running chunk loops whose completed
chunks were committed (scripts/add_custom_tags.py:443-477, resume markers like
`multi_grid IS NULL`, 06_handle_roads_intersecting_multiple_grids.sql:14).
Here that contract is explicit and queryable: a stage's output is written one
**cell-id range** at a time; each completed range appends a manifest record

    {stage, range_id, lo, hi, output_rows, wall_s, lineage, finished_at_ns}

written atomically (tmp + rename).  On restart, ranges whose manifest record
exists with a matching lineage hash are skipped — the exact analogue of the
reference's committed chunks, but with lineage so a changed input or changed
stage version invalidates stale checkpoints instead of silently reusing them.

At cluster scale the ranges ARE the Iceberg partitions (partition-by-cell
overwrite); locally they are parquet subdirectories.  Determinism of every
stage (no wall-clock, no rand) makes resumed runs bit-identical, which the
test asserts.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def read_manifest(out_dir: str) -> list[dict]:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_manifest(out_dir: str, rec: dict) -> None:
    p = _manifest_path(out_dir)
    tmp = p + ".tmp"
    recs = read_manifest(out_dir)
    recs.append(rec)
    with open(tmp, "w") as f:
        for r in recs:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    os.replace(tmp, p)


def lineage_hash(stage: str, inputs: list[str], version: str = "1") -> str:
    h = hashlib.sha256()
    h.update(stage.encode())
    h.update(version.encode())
    for x in sorted(inputs):
        h.update(x.encode())
    return h.hexdigest()[:16]


def make_ranges(lo: int, hi: int, n: int) -> list[tuple[int, int]]:
    """n contiguous [lo, hi) ranges covering the key space."""
    step = (hi - lo + n - 1) // n
    return [(lo + i * step, min(lo + (i + 1) * step, hi)) for i in range(n)
            if lo + i * step < hi]


def run_stage(spark: SparkSession,
              stage: str,
              df_fn: Callable[[], DataFrame],
              partition_col: str,
              ranges: list[tuple[int, int]],
              out_dir: str,
              lineage: str) -> dict:
    """Execute a stage range-by-range with skip-on-resume.

    Returns {"computed": [...], "skipped": [...], "rows": total}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = {
        (r["range_id"]): r for r in read_manifest(out_dir)
        if r["stage"] == stage and r["lineage"] == lineage
    }
    computed, skipped = [], []
    total = 0
    df = df_fn()
    for rid, (lo, hi) in enumerate(ranges):
        part_path = os.path.join(out_dir, f"range={rid}")
        if rid in done and os.path.exists(os.path.join(part_path, "_SUCCESS")):
            skipped.append(rid)
            total += done[rid]["output_rows"]
            continue
        t0 = time.time()
        part = df.filter((F.col(partition_col) >= lo) & (F.col(partition_col) < hi))
        part.write.mode("overwrite").parquet(part_path)
        rows = spark.read.parquet(part_path).count()
        _append_manifest(out_dir, {
            "stage": stage,
            "range_id": rid,
            "lo": lo,
            "hi": hi,
            "output_rows": rows,
            "wall_s": round(time.time() - t0, 3),
            "lineage": lineage,
            "finished_at_ns": time.time_ns(),
        })
        computed.append(rid)
        total += rows
    return {"computed": computed, "skipped": skipped, "rows": total}


def load_stage(spark: SparkSession, out_dir: str,
               stage: str | None = None, lineage: str | None = None) -> DataFrame:
    """Read a stage's output back from the checkpoint store.

    Reads ONLY the range directories recorded in the manifest for the given
    stage/lineage — a shrunk range layout under a new lineage leaves stale
    range=N directories on disk, and a bare glob would silently read them
    back alongside fresh output.  Falls back to the glob only when no
    manifest records match (legacy stores)."""
    recs = read_manifest(out_dir)
    if stage is not None:
        recs = [r for r in recs if r["stage"] == stage]
    if lineage is not None:
        recs = [r for r in recs if r["lineage"] == lineage]
    if not recs:
        return spark.read.parquet(os.path.join(out_dir, "range=*"))
    rids = sorted({r["range_id"] for r in recs})
    return spark.read.parquet(
        *[os.path.join(out_dir, f"range={rid}") for rid in rids])
