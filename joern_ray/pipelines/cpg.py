"""The flagship pipeline: webtext docs -> partitioned CPG node/edge Parquet.

Mirrors the reference's `joern-parse` lifecycle (SURVEY.md §3.1:
frontend AST creation → default overlays → linking → persist) as a
Ray-Data stage chain with Parquet checkpoints between the macro-stages:

  stage "parse"   docs → detect_fragments → ParseFragments (actor pool,
                  fused per-method CFG/DDG overlays + FILE nodes from
                  doc passthrough rows) → tagged-union checkpoint.
                  Pure map chain — streams, no shuffle.
  stage "survey"  ONE pass over the node stream emitting tagged partial
                  distincts/counts (dup FQNs, type fqns, namespace
                  names, call fqns) → one small groupby — replaces four
                  separate scans (combiner pattern, reference
                  accumulator merge `AstCreationPass.scala:27-72`).
  stage "link"    canonicalize colliding FQNs (shuffle ONLY duplicated
                  names), method index → broadcast or salted-shuffle
                  call link, map-side TYPE/FILE/NAMESPACE linking,
                  stubs derived from the survey (no extra pass).
  stage "write"   final nodes/edges, hash-partitioned with per-partition
                  manifests (resume = skip finished partitions).

Five Dataset executions total at steady state — execution-launch
overhead dominates small runs, so the count is a first-class design
constraint.  Checkpoints make macro-stages resumable (reference overlay
skip, `LayerCreator.scala:20-34`) and let downstream branches consume
Parquet instead of re-executing Ray lineage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..io.checkpoint import checkpoint, manifest_matches, partitioned_write
from ..schemas import EDGES_SCHEMA, NODES_SCHEMA, REJECTS_SCHEMA, rows_to_table
from ..stages.extract import detect_fragments_batch
from ..stages.link import (
    CallLinker,
    canonicalize_group,
    mapside_link_edges,
    namespace_id,
    salted_call_link,
    stub_id,
    type_id,
)
from ..stages.parse import ParseFragments

_KEEP = {
    "node": list(NODES_SCHEMA.names),
    "edge": list(EDGES_SCHEMA.names),
    "reject": list(REJECTS_SCHEMA.names),
}


def read_union_split(path: str, kind: str):
    """Column-pruned read of one row_kind from a union checkpoint: only
    the kind's columns (+ discriminator) leave the Parquet reader."""
    import ray.data

    keep = _KEEP[kind]
    ds = ray.data.read_parquet(path, columns=keep + ["row_kind"])

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("row_kind"), kind)).select(keep)

    return ds.map_batches(_f, batch_format="pyarrow")


class KeySetSplit:
    """map_batches actor: keep rows whose `column` value is (or is not)
    in a broadcast key set (`ray.put` once, read per actor)."""

    def __init__(self, keys_ref, column: str, invert: bool = False) -> None:
        import ray

        keys = ray.get(keys_ref) if not isinstance(keys_ref, (set, frozenset)) else keys_ref
        self.keys = pa.array(list(keys), pa.string())
        self.column = column
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.keys) == 0:
            return batch if self.invert else batch.slice(0, 0)
        mask = pc.is_in(batch.column(self.column), value_set=self.keys)
        if self.invert:
            mask = pc.invert(mask)
        return batch.filter(mask)


def _survey(nodes_ds) -> dict:
    """ONE execution: per-batch tagged partial counts/distincts →
    groupby(kind,key).sum → driver dicts.

    kinds: 'm' METHOD full_names (count), 'td' TYPE_DECL full_names
    (count), 'ty' type fqns (exploded; distinct), 'ns' namespace names
    (distinct), 'ca' CALL/METHOD_REF method_full_names (distinct)."""

    def partial(batch: pa.Table) -> pa.Table:
        ks, keys, cs = [], [], []
        labels = batch.column("label")
        for kind, lab in (("m", "METHOD"), ("td", "TYPE_DECL")):
            vc = batch.filter(pc.equal(labels, lab)).column("full_name").value_counts()
            vals = vc.field("values").to_pylist()
            cnts = vc.field("counts").to_pylist()
            for v, c in zip(vals, cnts):
                if v:
                    ks.append(kind)
                    keys.append(v)
                    cs.append(c)
        # distinct type fqns: unique over the filtered column (vectorized),
        # then a tiny loop over uniques only for the ;-explode
        tfn = pc.coalesce(batch.column("type_full_name"), pa.scalar(""))
        nonempty = batch.filter(pc.not_equal(tfn, ""))
        td_mask = pc.equal(nonempty.column("label"), "TYPE_DECL")
        tvals: set = set(
            pc.unique(nonempty.filter(pc.invert(td_mask)).column("type_full_name")).to_pylist()
        )
        for v in pc.unique(nonempty.filter(td_mask).column("type_full_name")).to_pylist():
            tvals.update(p for p in v.split(";") if p)
        for v in tvals:
            if v:
                ks.append("ty")
                keys.append(v)
                cs.append(1)
        for v in pc.unique(
            batch.filter(pc.equal(labels, "NAMESPACE_BLOCK")).column("name")
        ).to_pylist():
            if v:
                ks.append("ns")
                keys.append(v)
                cs.append(1)
        calls = batch.filter(
            pc.is_in(labels, value_set=pa.array(["CALL", "METHOD_REF"]))
        ).column("method_full_name")
        for v in pc.unique(calls).to_pylist():
            if v:
                ks.append("ca")
                keys.append(v)
                cs.append(1)
        return pa.table(
            {
                "kind": pa.array(ks, pa.string()),
                "key": pa.array(keys, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    agg = nodes_ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["kind", "key"]
    ).sum("c")
    out: dict[str, dict[str, int]] = {"m": {}, "td": {}, "ty": {}, "ns": {}, "ca": {}}
    for b in agg.iter_batches(batch_format="pyarrow"):
        for k, key, c in zip(
            b.column("kind").to_pylist(),
            b.column("key").to_pylist(),
            b.column("sum(c)").to_pylist(),
        ):
            out[k][key] = c
    return out


def build_cpg(
    docs_factory,
    out_dir: str,
    fingerprint: str,
    *,
    parse_concurrency: int | tuple = (1, 16),
    batch_size: int = 128,
    broadcast_limit: int = 2_000_000,
    hot_key_threshold: int = 5_000,
    n_salts: int = 16,
    num_partitions: int = 32,
    force_shuffle_link: bool = False,
) -> dict:
    """Run the full pipeline; returns paths + row counts.

    `docs_factory(columns)` must return a fresh docs Dataset (optionally
    column-pruned); it is consumed exactly once (by the parse stage)."""
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    parse_path = os.path.join(out_dir, "parse")
    nodes_path = os.path.join(out_dir, "nodes")
    edges_path = os.path.join(out_dir, "edges")

    # ---- stage: parse (pure map chain, streams) -----------------------
    def parse_pipeline():
        ds = docs_factory(None)
        frags = ds.map_batches(detect_fragments_batch, batch_format="pyarrow")
        return frags.map_batches(
            ParseFragments,
            batch_size=batch_size,
            batch_format="pyarrow",
            concurrency=parse_concurrency,
        )

    checkpoint(parse_pipeline, parse_path, "parse", fingerprint)
    parse_fp = f"{fingerprint}/parse"

    if manifest_matches(nodes_path, parse_fp) and manifest_matches(edges_path, parse_fp):
        return {
            "out_dir": out_dir,
            "nodes_path": nodes_path,
            "edges_path": edges_path,
            "parse_path": parse_path,
            "resumed": True,
        }

    nodes = lambda: read_union_split(parse_path, "node")  # noqa: E731

    # ---- stage: survey (one pass) -------------------------------------
    sv = _survey(nodes())
    dup_fqns = frozenset(
        k for d in (sv["m"], sv["td"]) for k, c in d.items() if c >= 2
    )
    n_methods = len(sv["m"])
    use_broadcast = (not force_shuffle_link) and n_methods <= broadcast_limit

    # ---- stage: link --------------------------------------------------
    def mt_proj():
        def _f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("label"), value_set=pa.array(["METHOD", "TYPE_DECL"]))
            return batch.filter(m)

        return nodes().map_batches(_f, batch_format="pyarrow")

    def other_proj():
        def _f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("label"), value_set=pa.array(["METHOD", "TYPE_DECL"]))
            return batch.filter(pc.invert(m))

        return nodes().map_batches(_f, batch_format="pyarrow")

    link_regime = "broadcast" if use_broadcast else "salted_shuffle"
    if use_broadcast:
        # collect METHOD/TYPE_DECL rows ONCE and canonicalize in memory —
        # one scan, no shuffle; feeds the method index, stub derivation
        # AND the final node write (no checkpoint)
        from ..stages.link import canonicalize_table

        parts = list(mt_proj().iter_batches(batch_format="pyarrow"))
        canon_t = (
            canonicalize_table(pa.concat_tables(parts))
            if parts
            else NODES_SCHEMA.empty_table()
        )
        m_mask = pc.equal(canon_t.column("label"), "METHOD")
        methods_t = canon_t.filter(m_mask)
        # first-wins per fqn (deterministic: sort by (fqn, id))
        methods_t = methods_t.take(
            pc.sort_indices(methods_t, sort_keys=[("full_name", "ascending"), ("id", "ascending")])
        )
        import numpy as np

        fns = methods_t.column("full_name").to_numpy(zero_copy_only=False)
        keepm = np.ones(len(fns), dtype=bool)
        if len(fns):
            keepm[1:] = fns[1:] != fns[:-1]
        index_table = methods_t.filter(pa.array(keepm)).select(["full_name", "id"])
        index_ref = ray.put(index_table)
        known = set(index_table.column("full_name").to_pylist())
        canonical_mt_for_write = ray.data.from_arrow(canon_t) if canon_t.num_rows else None
        salted = None
    else:
        # distributed canonicalization: shuffle ONLY rows whose full_name
        # actually collides (dup survey keeps the Sort input tiny)
        dup_ref = ray.put(dup_fqns)
        mt_unique = mt_proj().map_batches(
            KeySetSplit,
            fn_constructor_args=(dup_ref, "full_name", True),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        if dup_fqns:
            mt_dups = (
                mt_proj()
                .map_batches(
                    KeySetSplit,
                    fn_constructor_args=(dup_ref, "full_name", False),
                    batch_format="pyarrow",
                    concurrency=(1, 8),
                )
                .groupby("full_name")
                .map_groups(canonicalize_group, batch_format="pyarrow")
            )
            canonical_mt = mt_unique.union(mt_dups)
        else:
            canonical_mt = mt_unique
        canon_path = os.path.join(out_dir, "canonical_mt")
        checkpoint(lambda: canonical_mt, canon_path, "canonical_mt", parse_fp)
        canonical_mt_for_write = ray.data.read_parquet(canon_path)
        known = set(sv["m"].keys())
        index_ref = None
        salted = lambda facts: salted_call_link(  # noqa: E731
            facts,
            ray.data.read_parquet(canon_path),
            hot_keys={k for k, c in sv["ca"].items() if c >= hot_key_threshold},
            n_salts=n_salts,
        )

    def calls_proj():
        def _f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("label"), value_set=pa.array(["CALL", "METHOD_REF"]))
            return batch.filter(m).select(["id", "label", "method_full_name"])

        return nodes().map_batches(_f, batch_format="pyarrow")

    if use_broadcast:
        link_edges = calls_proj().map_batches(
            CallLinker,
            fn_constructor_args=(index_ref,),
            batch_size=8192,
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    else:
        link_edges = salted(calls_proj())

    # dimensions + stubs — derived from the survey, zero extra passes
    stub_fqns = sorted(set(sv["ca"].keys()) - known)
    dim_rows: list[dict] = [
        {
            "id": type_id(f),
            "label": "TYPE",
            "name": f,
            "full_name": f,
            "order": 0,
            "argument_index": -1,
            "line": -1,
            "col": -1,
        }
        for f in sorted(sv["ty"].keys())
    ] + [
        {
            "id": namespace_id(n),
            "label": "NAMESPACE",
            "name": n,
            "full_name": n,
            "order": 0,
            "argument_index": -1,
            "line": -1,
            "col": -1,
        }
        for n in sorted(sv["ns"].keys())
    ] + [
        {
            "id": stub_id(f),
            "label": "METHOD",
            "name": f.rsplit(".", 1)[-1] if not f.startswith("<operator>") else f,
            "full_name": f,
            "signature": "",
            "code": "<empty>",
            "order": 0,
            "argument_index": -1,
            "line": -1,
            "col": -1,
            "lang": "",
        }
        for f in stub_fqns
    ]
    dims_ds = ray.data.from_arrow(rows_to_table(dim_rows, NODES_SCHEMA))

    # ---- stage: write (partitioned, per-partition manifests) ----------
    def all_nodes():
        base = other_proj()
        if canonical_mt_for_write is not None:
            base = base.union(canonical_mt_for_write)
        return base

    mapside_edges = all_nodes().map_batches(mapside_link_edges, batch_format="pyarrow")
    final_nodes = all_nodes().union(dims_ds)
    final_edges = read_union_split(parse_path, "edge").union(link_edges, mapside_edges)
    partitioned_write(final_nodes, nodes_path, "nodes", parse_fp, num_partitions)
    partitioned_write(final_edges, edges_path, "edges", parse_fp, num_partitions)
    return {
        "out_dir": out_dir,
        "nodes_path": nodes_path,
        "edges_path": edges_path,
        "parse_path": parse_path,
        "link_regime": link_regime,
        "n_methods": n_methods,
        "n_stubs": len(stub_fqns),
        "resumed": False,
    }
