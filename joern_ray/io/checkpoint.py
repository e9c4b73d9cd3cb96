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

ENGINE_VERSION = "0.7.0"  # bumped: <ret:> containment, kotlin body MEMBERs, php tag fix, ast_link

_PARSER_FP: str | None = None


def parser_fingerprint() -> str:
    """Content hash of every parse-output-affecting module, folded into
    the build fingerprint by `build_cpg` — a checkpoint taken before ANY
    parser change resumes as stale instead of silently lacking the new
    nodes (ADVICE r4: manual ENGINE_VERSION bumps were missed for
    same-version parse changes).  Cached per process; ~10 small files."""
    global _PARSER_FP
    if _PARSER_FP is None:
        import hashlib

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(
            [
                os.path.join(pkg, "parsing", f)
                for f in os.listdir(os.path.join(pkg, "parsing"))
                if f.endswith(".py")
            ]
            + [
                os.path.join(pkg, "stages", "parse.py"),
                os.path.join(pkg, "stages", "extract.py"),
                os.path.join(pkg, "stages", "survey.py"),
                os.path.join(pkg, "graph", "cfg.py"),
                os.path.join(pkg, "schemas.py"),
            ]
        )
        h = hashlib.sha1()
        for p in paths:
            try:
                with open(p, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(p.encode())
        _PARSER_FP = h.hexdigest()[:12]
    return _PARSER_FP


def _footer_row_count(path: str) -> tuple[int, list[str]]:
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    files = sorted(ds.files)

    def _n(frag) -> int:
        return frag.metadata.num_rows if frag.metadata is not None else frag.count_rows()

    # footer reads are tiny independent IOs — a serial loop over hundreds
    # of files costs seconds of driver time
    with ThreadPoolExecutor(max_workers=16) as ex:
        n = sum(ex.map(_n, ds.get_fragments()))
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


def checkpoint(ds_factory, path: str, stage: str, fingerprint: str, partition_cols=None):
    """Run `ds_factory()` and write its Dataset to `path` unless a valid
    manifest already covers it; return a Dataset read back from disk.

    Reading back (rather than reusing the in-memory Dataset) makes every
    downstream branch consume Parquet instead of re-executing lineage —
    the fix for Ray Data re-running upstream stages once per consumer.
    `partition_cols` hive-partitions the checkpoint (e.g. by row_kind) so
    consumers of one kind scan only that kind's files.
    """
    import shutil as _shutil

    import ray.data

    if not manifest_matches(path, fingerprint):
        t0 = time.perf_counter()
        if os.path.isdir(path):  # stale/partial output: clear it
            _shutil.rmtree(path)
        ds = ds_factory()
        if partition_cols:
            ds.write_parquet(path, partition_cols=partition_cols)
        else:
            ds.write_parquet(path)
        if not os.path.isdir(path):
            # a 0-row Dataset writes no files at all; materialize an
            # empty parquet carrying the schema so read-back and the
            # manifest row count still work (overlay passes can
            # legitimately match nothing on a given corpus)
            import pyarrow.parquet as _pq

            os.makedirs(path, exist_ok=True)
            sch = ds.schema(fetch_if_missing=True)
            sch = getattr(sch, "base_schema", sch)
            _pq.write_table(sch.empty_table(), os.path.join(path, "empty.parquet"))
        write_manifest(path, stage, fingerprint, time.perf_counter() - t0)
    return ray.data.read_parquet(path)


def partitioned_write(
    ds,
    path: str,
    stage: str,
    fingerprint: str,
    num_partitions: int = 64,
):
    """Final materialization: `part = hash-id % P` → groupby("part") →
    one sorted Parquet file + manifest per partition.

    Why not `write_parquet(partition_cols=...)`: that writes one file per
    (input block × partition) — observed 22k tiny files for 128 MB.  The
    groupby shuffle costs one exchange but yields P right-sized files.

    Resume: partitions whose manifest already matches are filtered out
    BEFORE the shuffle (rows dropped map-side), so a restarted run pays
    only for unfinished partitions; within-partition sort makes files
    byte-stable across runs (north rule: kill/restart → byte-identical
    output)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = "subj" if "subj" in ds.schema().names else "id"
    os.makedirs(path, exist_ok=True)
    done = frozenset(
        k
        for k in range(num_partitions)
        if manifest_matches(os.path.join(path, f"part={k}"), fingerprint)
    )
    t0 = time.perf_counter()

    def add_part(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (vals % np.uint64(num_partitions)).astype(np.int32)
        batch = batch.append_column("part", pa.array(part))
        if done:
            keep = ~np.isin(part, list(done))
            batch = batch.filter(pa.array(keep))
        return batch

    sort_cols = [
        c
        for c in (key, "pred", "obj", "variable", "label", "full_name")
        if c in ds.schema().names
    ]
    # edge-shaped tables get the global edge-duplication guard (reference
    # `DynamicCallLinker.scala:181-192` checks existing edges before
    # adding): two linker passes resolving the same call must emit ONE
    # edge.  Partitioning is by hash(subj), so a within-partition dedup
    # after the sort IS global over this root — no extra shuffle.
    is_edges = key == "subj"

    def write_group(batch: pa.Table) -> pa.Table:
        part = batch.column("part")[0].as_py()
        batch = batch.take(
            pc.sort_indices(batch, sort_keys=[(c, "ascending") for c in sort_cols])
        ).drop_columns(["part"])
        if is_edges and batch.num_rows > 1:
            keep = np.zeros(batch.num_rows, dtype=bool)
            keep[0] = True
            for c in ("subj", "pred", "obj", "variable"):
                col = batch.column(c)
                neq = pc.not_equal(col.slice(1), col.slice(0, batch.num_rows - 1))
                # null-safe: is_valid XOR handles null-vs-value; two nulls
                # compare equal for dedup purposes
                v = col.is_valid()
                v_hi = v.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(v, pa.ChunkedArray) else v.to_numpy(zero_copy_only=False)
                neq_np = pc.coalesce(neq, pa.scalar(False))
                neq_np = (
                    neq_np.combine_chunks().to_numpy(zero_copy_only=False)
                    if isinstance(neq_np, pa.ChunkedArray)
                    else neq_np.to_numpy(zero_copy_only=False)
                )
                keep[1:] |= neq_np | (v_hi[1:] != v_hi[:-1])
            batch = batch.filter(pa.array(keep))
        sub = os.path.join(path, f"part={part}")
        os.makedirs(sub, exist_ok=True)
        fp = os.path.join(sub, "data.parquet")
        pq.write_table(batch, fp + ".tmp")
        os.replace(fp + ".tmp", fp)
        return pa.table({"part": pa.array([part], pa.int32()), "rows": pa.array([batch.num_rows], pa.int64())})

    # materialize before the shuffle: Ray's sort-based groupby runs a
    # boundary-sampling pass first, which would re-execute the (expensive)
    # upstream lineage a second time; materialized blocks live in the
    # object store and spill under pressure.  Then coalesce: the sort's
    # cost scales with block COUNT, not bytes (observed 35s over 708
    # tiny union-produced blocks vs 2s over 160) — repartition first.
    import sys

    _prof = os.environ.get("JOERN_RAY_PROFILE")
    _tm = time.perf_counter()
    tagged = ds.map_batches(add_part, batch_format="pyarrow").materialize()
    if _prof:
        print(
            f"[partitioned_write:{stage}] materialize: {time.perf_counter() - _tm:.2f}s",
            file=sys.stderr,
            flush=True,
        )
        _tm = time.perf_counter()
    if tagged.num_blocks() > 2 * num_partitions:
        tagged = tagged.repartition(num_partitions)
    written = tagged.groupby("part").map_groups(write_group, batch_format="pyarrow")
    parts_written: dict[int, int] = {}
    for b in written.iter_batches(batch_format="pyarrow", batch_size=None):
        for p, r in zip(b.column("part").to_pylist(), b.column("rows").to_pylist()):
            parts_written[p] = r
    if _prof:
        print(
            f"[partitioned_write:{stage}] shuffle+write: {time.perf_counter() - _tm:.2f}s",
            file=sys.stderr,
            flush=True,
        )
    wall = time.perf_counter() - t0
    total = 0
    for p in sorted(parts_written):
        m = write_manifest(
            os.path.join(path, f"part={p}"), f"{stage}[part={p}]", fingerprint, wall
        )
        total += m["rows"]
    for p in done:
        mp = manifest_path(os.path.join(path, f"part={p}"))
        with open(mp) as f:
            total += json.load(f).get("rows", 0)
    write_manifest(path, stage, fingerprint, wall, extra={"total_rows": total})
    return path
