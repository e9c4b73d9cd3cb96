"""Small shared runtime helpers."""

from __future__ import annotations


def fixed_pool(frac: float = 0.5, cap: int = 16, floor: int = 2) -> int:
    """Fixed actor-pool size off the cluster CPU count.

    Autoscaling pools starting at 1 never ramp for minutes-long stages
    (measured, BASELINE.md round-1 notes), and pools sized at n_cpus pin
    every CPU, starving concurrent task stages (measured: the parse
    write serialized on 1 CPU).  A fixed pool at a fraction of the
    cluster with a cap is the robust middle ground.
    """
    import ray

    n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(floor, min(cap, int(n * frac)))


def resolve_pool(concurrency):
    """None -> fixed_pool(); anything else passes through (tests pass
    explicit small pools)."""
    return fixed_pool() if concurrency is None else concurrency


def bucketed_group_agg(ds, keys, aggs, num_buckets=32, seed=11):
    """Distributed group-aggregate that stays VECTORIZED end to end.

    Ray's built-in ``groupby().aggregate(Sum/Min/...)`` accumulates one
    Python call per ROW inside the sort-shuffle reduce (measured 7.2s
    for 350k tiny rows at 32 CPUs where this shape takes 2.6s).  This
    helper does: map-side combine (``pyarrow.Table.group_by`` — C++),
    then a shuffle on a SMALL deterministic int bucket key (polars
    fixed-seed hash of the group keys — the builtin ``hash()`` is salted
    per worker process and would split a key across buckets), then one
    vectorized combine per bucket.  Per-bucket size is
    distinct_keys/num_buckets regardless of corpus size, so the pattern
    holds at 10^12 rows by raising ``num_buckets`` with the cluster.

    ``keys``: list of group-key column names.  ``aggs``: list of
    ``(col, fn)`` with fn in pyarrow's hash-aggregate set ("sum", "min",
    "max", "count", ...).  Output columns: keys + ``{col}_{fn}``.
    Count columns are re-summed (not re-counted) in the reduce combine.
    """
    import numpy as np
    import polars as pl
    import pyarrow as pa

    out_names = list(keys) + [f"{c}_{f}" for c, f in aggs]
    # reduce-side: a partial "count" must be summed, min stays min, etc.
    reaggs = [
        (f"{c}_{f}", "sum" if f == "count" else f) for c, f in aggs
    ]
    # pyarrow names hash-aggregate outputs "{col}_{fn}" but the COLUMN
    # ORDER (keys-first vs aggregates-first) is version-dependent, so we
    # always select by NAME rather than renaming positionally.
    map_names = list(keys) + [f"{c}_{f}" for c, f in aggs]
    red_names = list(keys) + [f"{c}_{f2}" for (c, f2) in reaggs]

    def _bucket_col(t: pa.Table) -> pa.Table:
        h = None
        for k in keys:
            kh = pl.from_arrow(t.column(k).combine_chunks()).hash(seed=seed).to_numpy()
            h = kh if h is None else (h * np.uint64(0x9E3779B97F4A7C15)) ^ kh
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(bucket, pa.int64()))

    def _map_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(aggs).select(map_names)
        return _bucket_col(g.rename_columns(out_names))

    def _reduce_combine(g: pa.Table) -> pa.Table:
        t = g.drop(["__bkt"]).group_by(keys).aggregate(reaggs).select(red_names)
        return t.rename_columns(out_names)

    return (
        ds.map_batches(_map_combine, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(_reduce_combine, batch_format="pyarrow")
    )
