"""The flagship pipeline: webtext docs -> partitioned CPG node/edge Parquet.

Mirrors the reference's `joern-parse` lifecycle (SURVEY.md §3.1:
frontend AST creation → default overlays → linking → persist) as a
Ray-Data stage chain with Parquet checkpoints between the macro-stages:

  stage "parse"   docs → detect_fragments → ParseFragments (actor pool,
                  fused per-method CFG/DDG overlays) → tagged-union
                  checkpoint.  Pure map chain — streams, no shuffle.
  stage "link"    canonicalize colliding FQNs (shuffle ONLY rows whose
                  full_name is actually duplicated — dup survey first),
                  method index → broadcast or salted-shuffle call link,
                  map-side TYPE/FILE/NAMESPACE linking, stub synthesis.
  stage "write"   final nodes/edges, hash-partitioned with per-partition
                  manifests (resume = skip finished partitions).

Checkpoints make each macro-stage resumable (reference overlay skip,
`LayerCreator.scala:20-34`) and let multiple downstream branches consume
Parquet instead of re-executing Ray lineage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..io.checkpoint import checkpoint, manifest_matches, partitioned_write
from ..schemas import EDGES_SCHEMA, NODES_SCHEMA, REJECTS_SCHEMA
from ..stages.extract import detect_fragments_batch
from ..stages.link import (
    CallLinker,
    canonicalize_group,
    file_nodes_batch,
    key_count_survey,
    mapside_link_edges,
    method_index_table,
    namespace_dimension,
    salted_call_link,
    type_dimension,
    unresolved_stub_dimension,
)
from ..stages.parse import ParseFragments, UNION_SCHEMA

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
        self.keys = frozenset(keys)
        self.column = column
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column(self.column), value_set=pa.array(list(self.keys), pa.string())
        ) if self.keys else pa.array([False] * batch.num_rows)
        if self.invert:
            mask = pc.invert(mask)
        return batch.filter(mask)


def build_cpg(
    docs_factory,
    out_dir: str,
    fingerprint: str,
    *,
    parse_concurrency: int | tuple = (1, 16),
    batch_size: int = 256,
    broadcast_limit: int = 2_000_000,
    hot_key_threshold: int = 5_000,
    n_salts: int = 16,
    num_partitions: int = 32,
    force_shuffle_link: bool = False,
) -> dict:
    """Run the full pipeline; returns paths + row counts.

    `docs_factory(columns)` must return a fresh docs Dataset (optionally
    column-pruned) — a factory because Ray Datasets re-execute lineage
    per consumer, and the docs table is read twice (full for parse,
    url-only for FILE nodes).
    """
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
            "resumed": True,
        }

    # ---- stage: link --------------------------------------------------
    nodes = lambda: read_union_split(parse_path, "node")  # noqa: E731

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

    # canonicalization: shuffle only colliding FQNs (FullNameUniqueness
    # analog; dup survey keeps the shuffle tiny).
    dup_fqns = key_count_survey(
        mt_proj().map_batches(
            lambda b: b.select(["full_name"]), batch_format="pyarrow"
        ),
        "full_name",
        threshold=2,
    )
    dup_ref = ray.put(frozenset(dup_fqns))
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

    # canonical method/typedecl rows are needed by several consumers —
    # checkpoint them once.
    canon_path = os.path.join(out_dir, "canonical_mt")
    checkpoint(lambda: canonical_mt, canon_path, "canonical_mt", parse_fp)
    canonical_mt_ds = lambda: ray.data.read_parquet(canon_path)  # noqa: E731

    # method index: broadcast vs shuffle regime
    n_methods = (
        canonical_mt_ds()
        .map_batches(
            lambda b: pa.table(
                {"n": [int(pc.sum(pc.equal(b.column("label"), "METHOD")).as_py() or 0)]}
            ),
            batch_format="pyarrow",
        )
        .sum("n")
    )
    use_broadcast = (not force_shuffle_link) and n_methods <= broadcast_limit

    def calls_proj():
        def _f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("label"), value_set=pa.array(["CALL", "METHOD_REF"]))
            return batch.filter(m).select(["id", "label", "method_full_name"])

        return nodes().map_batches(_f, batch_format="pyarrow")

    index_table = method_index_table(canonical_mt_ds()) if use_broadcast else None

    if use_broadcast:
        index_ref = ray.put(index_table)
        link_edges = calls_proj().map_batches(
            CallLinker,
            fn_constructor_args=(index_ref,),
            batch_size=8192,
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    else:
        hot = key_count_survey(
            calls_proj().map_batches(
                lambda b: b.select(["method_full_name"]), batch_format="pyarrow"
            ),
            "method_full_name",
            threshold=hot_key_threshold,
        )
        link_edges = salted_call_link(
            calls_proj(), canonical_mt_ds(), hot_keys=hot, n_salts=n_salts
        )

    # map-side dimension links (EVAL_TYPE / SOURCE_FILE / NAMESPACE REF)
    # over the final node stream (others + canonical MT)
    def all_nodes():
        return other_proj().union(canonical_mt_ds())

    mapside_edges = all_nodes().map_batches(
        mapside_link_edges, batch_format="pyarrow"
    )

    # dimensions (small driver tables) + stubs
    types_t = type_dimension(all_nodes())
    ns_t = namespace_dimension(all_nodes())
    if use_broadcast:
        stub_known = index_table
    else:
        stub_known = method_index_table(canonical_mt_ds())
    stubs_t = unresolved_stub_dimension(calls_proj(), stub_known)
    dims_list = [t for t in (types_t, ns_t, stubs_t) if t.num_rows]
    dims_ds = (
        ray.data.from_arrow(dims_list)
        if dims_list
        else ray.data.from_arrow(NODES_SCHEMA.empty_table())
    )
    file_nodes = docs_factory(["url"]).map_batches(
        file_nodes_batch, batch_format="pyarrow"
    )

    # ---- stage: write (partitioned, per-partition manifests) ----------
    final_nodes = all_nodes().union(dims_ds, file_nodes)
    final_edges = read_union_split(parse_path, "edge").union(
        link_edges, mapside_edges
    )
    partitioned_write(final_nodes, nodes_path, "nodes", parse_fp, num_partitions)
    partitioned_write(final_edges, edges_path, "edges", parse_fp, num_partitions)
    return {
        "out_dir": out_dir,
        "nodes_path": nodes_path,
        "edges_path": edges_path,
        "parse_path": parse_path,
        "link_regime": "broadcast" if use_broadcast else "salted_shuffle",
        "n_methods": int(n_methods),
        "resumed": False,
    }
