"""Stage checkpoints with lineage manifests — the resumability layer.

Analog of the reference's overlay bookkeeping ("The overlay X already
exists - skipping creation", `semanticcpg/.../layers/LayerCreator.scala:
20-34`): a stage whose manifest exists with a matching input fingerprint
is skipped and its Parquet output is read back instead of recomputed.

Each checkpoint directory holds the stage's Parquet files plus
`_manifest.json` recording: stage name, input fingerprint, engine
version, row count (from Parquet footers — no data scan), file list and
wall time.  Final graph materialization additionally partitions by
`part = subj % P` with one manifest per partition so a killed run skips
finished partitions (north rule: per-partition lineage + metrics).
"""

from __future__ import annotations

import json
import os
import time

ENGINE_VERSION = "0.1.0"


def _footer_row_count(path: str) -> tuple[int, list[str]]:
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    files = sorted(ds.files)
    n = 0
    for frag in ds.get_fragments():
        n += frag.metadata.num_rows if frag.metadata is not None else frag.count_rows()
    return n, files


def manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def manifest_matches(path: str, fingerprint: str) -> bool:
    mp = manifest_path(path)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return (
        m.get("input_fingerprint") == fingerprint
        and m.get("engine_version") == ENGINE_VERSION
        and m.get("complete") is True
    )


def write_manifest(
    path: str, stage: str, fingerprint: str, wall_s: float, extra: dict | None = None
) -> dict:
    rows, files = _footer_row_count(path)
    m = {
        "stage": stage,
        "input_fingerprint": fingerprint,
        "engine_version": ENGINE_VERSION,
        "rows": rows,
        "files": [os.path.basename(f) for f in files],
        "wall_s": round(wall_s, 3),
        "complete": True,
    }
    if extra:
        m.update(extra)
    tmp = manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, manifest_path(path))  # atomic: readers never see partial
    return m


def checkpoint(ds_factory, path: str, stage: str, fingerprint: str):
    """Run `ds_factory()` and write its Dataset to `path` unless a valid
    manifest already covers it; return a Dataset read back from disk.

    Reading back (rather than reusing the in-memory Dataset) makes every
    downstream branch consume Parquet instead of re-executing lineage —
    the fix for Ray Data re-running upstream stages once per consumer.
    """
    import ray.data

    if not manifest_matches(path, fingerprint):
        t0 = time.perf_counter()
        if os.path.isdir(path):  # stale/partial output: clear data files
            for f in os.listdir(path):
                if f.endswith(".parquet"):
                    os.remove(os.path.join(path, f))
            mp = manifest_path(path)
            if os.path.exists(mp):
                os.remove(mp)
        ds = ds_factory()
        ds.write_parquet(path)
        write_manifest(path, stage, fingerprint, time.perf_counter() - t0)
    return ray.data.read_parquet(path)


def partitioned_write(ds, path: str, stage: str, fingerprint: str, num_partitions: int = 64):
    """Final materialization: adds `part = subj-or-id % P` and writes
    hive-partitioned Parquet with a per-partition manifest, so resume can
    skip finished partitions and downstream readers prune by part."""
    import numpy as np
    import pyarrow as pa

    key = "subj" if "subj" in ds.schema().names else "id"

    def add_part(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        part = pa.array((vals % np.uint64(num_partitions)).astype(np.int32))
        return batch.append_column("part", part)

    t0 = time.perf_counter()
    ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        path, partition_cols=["part"]
    )
    wall = time.perf_counter() - t0
    total = 0
    for d in sorted(os.listdir(path)):
        sub = os.path.join(path, d)
        if not (os.path.isdir(sub) and d.startswith("part=")):
            continue
        m = write_manifest(sub, f"{stage}[{d}]", fingerprint, wall)
        total += m["rows"]
    write_manifest(path, stage, fingerprint, wall, extra={"total_rows": total})
    return path
