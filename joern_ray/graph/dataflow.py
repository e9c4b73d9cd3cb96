"""Query-time data-flow: reachableBy as bounded-depth frontier expansion
+ backward slicing.

Re-expresses the reference's task-parallel backwards engine
(`dataflowengineoss/.../queryengine/Engine.scala:43-66`: one task per
sink, explore backwards along REACHING_DEF + CALL edges, results deduped
by fingerprint, bounded by `maxCallDepth = 4`, `Engine.scala:320-321`)
as an iterative dataset loop: each round joins the frontier against the
edge table; visited-set dedup replaces TaskFingerprint.

Implementation regime: the frontier is broadcast (`ray.put`) and each
round streams the edge table once through a `map_batches` filter —
rounds ≤ max_depth, so total work is max_depth edge scans regardless of
frontier size.  (A shuffle-join variant keyed on obj would be the next
regime for frontiers too large to broadcast.)
"""

from __future__ import annotations

from ..util import resolve_pool

import pyarrow as pa
import pyarrow.compute as pc

MAX_DEPTH = 4  # reference default `Engine.scala:320-321`

_FLOW_PREDS = ("REACHING_DEF",)


class _FrontierFilter:
    """map_batches actor: emit (step_from, step_to) edge rows whose
    match-end is in the broadcast frontier and pred in preds.
    direction "back" walks obj->subj (reachableBy); "fwd" walks
    subj->obj (forward taint)."""

    def __init__(self, frontier_ref, preds: tuple, direction: str = "back") -> None:
        import ray

        f = ray.get(frontier_ref) if not isinstance(frontier_ref, (set, frozenset)) else frontier_ref
        self.frontier = pa.array(list(f), pa.uint64())
        self.preds = pa.array(list(preds), pa.string())
        self.match_col, self.emit_col = ("obj", "subj") if direction == "back" else ("subj", "obj")

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(batch.column("pred"), value_set=self.preds),
            pc.is_in(batch.column(self.match_col), value_set=self.frontier),
        )
        b = batch.filter(m)
        return pa.table(
            {"next": b.column(self.emit_col), "from": b.column(self.match_col)}
        )


def reachable_by(
    edges_ds_factory,
    sink_ids: set[int],
    max_depth: int = MAX_DEPTH,
    preds: tuple = _FLOW_PREDS,
    direction: str = "back",
) -> pa.Table:
    """Reachability from `sink_ids` along `preds` edges — backwards by
    default (the reference engine explores from sinks,
    `Engine.scala:43-66`); direction="fwd" gives forward taint.

    Returns (node, parent, depth): node reaches parent's flow at `depth`
    steps from a seed.  `edges_ds_factory()` must yield a fresh edges
    Dataset per round (Parquet-backed → each scan streams from disk).
    """
    import ray

    visited: set[int] = set(sink_ids)
    frontier: set[int] = set(sink_ids)
    rows_node: list[int] = []
    rows_parent: list[int] = []
    rows_depth: list[int] = []
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        fref = ray.put(frozenset(frontier))
        hits = edges_ds_factory().map_batches(
            _FrontierFilter,
            fn_constructor_args=(fref, preds, direction),
            batch_format="pyarrow",
            concurrency=resolve_pool(None),
        )
        new_frontier: set[int] = set()
        for b in hits.iter_batches(batch_format="pyarrow"):
            for s, o in zip(b.column("next").to_pylist(), b.column("from").to_pylist()):
                rows_node.append(s)
                rows_parent.append(o)
                rows_depth.append(depth)
                if s not in visited:
                    visited.add(s)
                    new_frontier.add(s)
        frontier = new_frontier
    return pa.table(
        {
            "node": pa.array(rows_node, pa.uint64()),
            "parent": pa.array(rows_parent, pa.uint64()),
            "depth": pa.array(rows_depth, pa.int32()),
        }
    )


def backward_slice(
    edges_ds_factory,
    criterion_ids: set[int],
    max_depth: int = MAX_DEPTH,
    preds: tuple = ("REACHING_DEF", "CFG", "CDG"),
) -> set[int]:
    """Backward program slice: node ids influencing the criterion within
    `max_depth` hops (reference `DataFlowSlicing`/`UsageSlicing` fan
    per-method slice tasks; here one bounded frontier run)."""
    t = reachable_by(edges_ds_factory, criterion_ids, max_depth, preds)
    return set(t.column("node").to_pylist()) | set(criterion_ids)


def taint_flows(
    nodes_ds_factory,
    edges_ds_factory,
    source_pred,
    sink_pred,
    max_depth: int = MAX_DEPTH,
) -> pa.Table:
    """reachableBy(sources, sinks): backwards from sink nodes along
    REACHING_DEF; keep reached nodes that satisfy `source_pred`.

    source_pred / sink_pred: functions (pa.Table nodes batch) -> boolean
    mask (the DSL-filter analogue of `cpg.call("free").argument` etc.).
    Returns (source, sink, depth) flow rows.
    """
    sinks: set[int] = set()
    for b in nodes_ds_factory().iter_batches(batch_format="pyarrow"):
        m = sink_pred(b)
        sinks.update(b.filter(m).column("id").to_pylist())
    if not sinks:
        return pa.table(
            {"source": pa.array([], pa.uint64()), "sink": pa.array([], pa.uint64()), "depth": pa.array([], pa.int32())}
        )
    reach = reachable_by(edges_ds_factory, sinks, max_depth)
    # map each reached node to its originating sink by walking parents
    parent_of: dict[tuple[int, int], list[int]] = {}
    node_l = reach.column("node").to_pylist()
    par_l = reach.column("parent").to_pylist()
    dep_l = reach.column("depth").to_pylist()
    # resolve transitive origin: depth-1 parents are sinks; deeper rows
    # chain through any visited node
    origin: dict[int, set[int]] = {s: {s} for s in sinks}
    for d in range(1, (max(dep_l) if dep_l else 0) + 1):
        for n, p, dd in zip(node_l, par_l, dep_l):
            if dd == d and p in origin:
                origin.setdefault(n, set()).update(origin[p])
    sources: set[int] = set()
    for b in nodes_ds_factory().iter_batches(batch_format="pyarrow"):
        m = source_pred(b)
        sources.update(b.filter(m).column("id").to_pylist())
    out_s, out_k, out_d = [], [], []
    depth_of: dict[int, int] = {}
    for n, dd in zip(node_l, dep_l):
        depth_of[n] = min(depth_of.get(n, dd), dd)
    for n in set(node_l) & sources:
        for snk in origin.get(n, ()):
            out_s.append(n)
            out_k.append(snk)
            out_d.append(depth_of[n])
    return pa.table(
        {
            "source": pa.array(out_s, pa.uint64()),
            "sink": pa.array(out_k, pa.uint64()),
            "depth": pa.array(out_d, pa.int32()),
        }
    )
