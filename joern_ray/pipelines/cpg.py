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

Six core Dataset executions at steady state (parse, survey-agg,
canonicalize, fused dims+spec write, linked-edge write, overlapped
equivalence chain) — execution-launch overhead dominates small runs,
so the count is a first-class design constraint.  Checkpoints make macro-stages resumable (reference overlay
skip, `LayerCreator.scala:20-34`) and let downstream branches consume
Parquet instead of re-executing Ray lineage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64
from ..io.checkpoint import ENGINE_VERSION as _ENGINE_VERSION
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
    "mtnode": list(NODES_SCHEMA.names),
    "edge": list(EDGES_SCHEMA.names),
    "reject": list(REJECTS_SCHEMA.names),
    "survey": ["skind", "skey", "sc", "sn", "sx"],
}


def _parquet_files(roots: list[str]) -> list[str]:
    files: list[str] = []
    for root in roots:
        for dirpath, _dirs, names in os.walk(root):
            files.extend(
                os.path.join(dirpath, f) for f in names if f.endswith(".parquet")
            )
    return sorted(files)


def edges_paths(out_dir: str) -> list[str]:
    """The final edges table is LOGICALLY one partitioned table over two
    physical roots: parse-time AST/overlay edges (already hive-partitioned
    by part at parse — never re-shuffled) + the linker-derived edges
    (partition-written after linking).  Returns the concrete parquet file
    list (read_parquet accepts files, not directory lists)."""
    dims = os.path.join(out_dir, "dims")
    spec = (
        os.path.join(dims, "rk=edge")
        if os.path.isdir(os.path.join(dims, "rk=edge"))
        else os.path.join(out_dir, "edges_spec")  # pre-round-4 layout
    )
    return _parquet_files(
        [
            os.path.join(out_dir, "edges"),
            os.path.join(out_dir, "parse", "row_kind=edge"),
            spec,
            os.path.join(out_dir, "edges_astlink"),  # cross-fragment AstLinkerPass
            os.path.join(out_dir, "edges_inherit"),  # XInheritanceFullNamePass
        ]
    )


def nodes_paths(out_dir: str) -> list[str]:
    """The final nodes table is LOGICALLY one table over three physical
    roots — plain parse-time nodes, canonicalized METHOD/TYPE_DECL rows,
    and the survey-derived dimension/stub rows.  NOTHING is rewritten:
    at 10^12 nodes, re-shuffling every node into a second copy just to
    co-locate it is the single largest avoidable write (observed
    superlinear at 600k docs); the checkpoints are already deterministic,
    manifested and resumable, so they ARE the output."""
    dims = os.path.join(out_dir, "dims")
    if os.path.isdir(os.path.join(dims, "rk=node")):
        dims = os.path.join(dims, "rk=node")  # round-4 fused layout
    return _parquet_files(
        [
            os.path.join(out_dir, "parse", "row_kind=node"),
            os.path.join(out_dir, "canonical_mt"),
            dims,
        ]
    )


def read_nodes(out_dir: str, columns: list[str] | None = None):
    """Read the full node set (all physical roots) with a fixed column
    projection so mixed physical schemas unify."""
    import ray.data

    return ray.data.read_parquet(
        nodes_paths(out_dir), columns=columns or list(NODES_SCHEMA.names)
    )


def read_edges(out_dir: str, columns: list[str] | None = None):
    """Read the full edge set (both physical roots) with a fixed column
    projection so mixed physical schemas unify."""
    import ray.data

    return ray.data.read_parquet(
        edges_paths(out_dir), columns=columns or list(EDGES_SCHEMA.names)
    )


def read_union_split(path: str, kind: str):
    """Read one row_kind from a union checkpoint.  The checkpoint is
    hive-partitioned by row_kind, so this scans ONLY that kind's files
    and decodes only its columns; falls back to filter for un-partitioned
    checkpoints (older layouts)."""
    import ray.data

    keep = _KEEP[kind]
    sub = os.path.join(path, f"row_kind={kind}")
    if os.path.isdir(sub):
        return ray.data.read_parquet(sub, columns=keep)
    ds = ray.data.read_parquet(path, columns=keep + ["row_kind"])

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("row_kind"), kind)).select(keep)

    return ds.map_batches(_f, batch_format="pyarrow")


# Per-worker memo for broadcast key sets: plain TASKS (no pinned actor
# CPUs — actor pools here starved concurrent Sort stages into deadlock at
# low CPU counts), with the pa.array built once per worker process.
_KEYSET_CACHE: dict = {}


def keyset_split_fn(keys_ref, column: str, invert: bool = False):
    """Task UDF factory: keep rows whose `column` value is (or is not) in
    the `ray.put` key set; closure carries only the ObjectRef."""

    def _fn(batch: pa.Table) -> pa.Table:
        import ray

        ck = keys_ref.hex() if hasattr(keys_ref, "hex") else str(id(keys_ref))
        keys = _KEYSET_CACHE.get(ck)
        if keys is None:
            if len(_KEYSET_CACHE) > 4:
                _KEYSET_CACHE.clear()
            got = ray.get(keys_ref) if not isinstance(keys_ref, (set, frozenset)) else keys_ref
            keys = pa.array(list(got), pa.string())
            _KEYSET_CACHE[ck] = keys
        if len(keys) == 0:
            return batch if invert else batch.slice(0, 0)
        mask = pc.is_in(batch.column(column), value_set=keys)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return _fn


def build_cpg(
    docs_factory,
    out_dir: str,
    fingerprint: str,
    *,
    parse_concurrency: int | tuple | None = None,
    batch_size: int = 128,
    broadcast_limit: int = 2_000_000,
    hot_key_threshold: int = 5_000,
    n_salts: int = 16,
    num_partitions: int = 32,
    force_shuffle_link: bool = False,
    compdb_json: str | None = None,
) -> dict:
    """Run the full pipeline; returns paths + row counts.

    `docs_factory(columns)` must return a fresh docs Dataset (optionally
    column-pruned); it is consumed exactly once (by the parse stage).

    `compdb_json`: compile_commands.json content — when given, C-family
    fragments are restricted to the database's file set and parsed with
    its per-file `-D` defines (reference JSONCompilationDatabaseParser,
    `c2cpg/.../parser/JSONCompilationDatabaseParser.scala:34-111`)."""
    import sys
    import time

    import ray
    import ray.data

    _prof = os.environ.get("JOERN_RAY_PROFILE")
    _t = [time.perf_counter()]

    def _mark(label: str) -> None:
        if _prof:
            _t.append(time.perf_counter())
            print(f"[build_cpg] {label}: {_t[-1] - _t[-2]:.2f}s", file=sys.stderr, flush=True)
            _t[-1] = time.perf_counter()

    os.makedirs(out_dir, exist_ok=True)
    # fold the parser-code fingerprint into the lineage fingerprint: any
    # parse-output-affecting code change invalidates checkpoints without
    # relying on a manual ENGINE_VERSION bump (ADVICE r4)
    from ..io.checkpoint import parser_fingerprint

    user_fingerprint = fingerprint
    fingerprint = f"{fingerprint}+p{parser_fingerprint()}"
    compdb = None
    if compdb_json is not None:
        from ..sources.compdb import parse_compilation_database
        from ..stages.extract import hash64_bytes

        compdb = parse_compilation_database(compdb_json)
        # the database shapes parse output -> it is lineage
        fingerprint += f"+cdb{hash64_bytes(compdb_json.encode()) & 0xFFFFFFFF:08x}"
    parse_path = os.path.join(out_dir, "parse")
    dims_path = os.path.join(out_dir, "dims")
    edges_path = os.path.join(out_dir, "edges")

    # ---- stage: parse (pure map chain, streams) -----------------------
    # FIXED-size actor pool sized to ~3/4 of the cluster: an autoscaling
    # pool starting at 1 ramps too slowly for a minutes-long stage, and a
    # pool of n_cpus-1 PINS those CPUs, leaving the concurrent Parquet
    # write tasks a single slot — measured 23s -> 13s at 32 CPUs for the
    # same input just by leaving 1/4 of the CPUs to the write stage.
    if parse_concurrency is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        eff_parse_concurrency: int | tuple = max(2, (n_cpus * 3) // 4)
    else:
        eff_parse_concurrency = parse_concurrency

    def parse_pipeline():
        ds = docs_factory(None)
        frags = ds.map_batches(detect_fragments_batch, batch_format="pyarrow")
        if compdb is not None:
            import functools

            from ..sources.compdb import apply_compdb_batch

            frags = frags.map_batches(
                functools.partial(apply_compdb_batch, db=compdb),
                batch_format="pyarrow",
            )
        return frags.map_batches(
            ParseFragments,
            batch_size=batch_size,
            batch_format="pyarrow",
            concurrency=eff_parse_concurrency,
        )

    # partition the checkpoint by row_kind ONLY: adding `part` here would
    # explode into blocks × kinds × parts tiny files; `part` stays a data
    # column used by the final partitioned write
    checkpoint(
        parse_pipeline,
        parse_path,
        "parse",
        fingerprint,
        partition_cols=["row_kind"],
    )
    # per-stage metrics: reject counts are free from the reject dir's
    # Parquet footers (the north rule's lineage + metrics; reference
    # Report table analog, `x2cpg/.../utils/Report.scala:27-60`)
    import json as _json

    from ..io.checkpoint import _footer_row_count, manifest_path

    reject_dir = os.path.join(parse_path, "row_kind=reject")
    n_rejects = _footer_row_count(reject_dir)[0] if os.path.isdir(reject_dir) else 0
    try:
        mp = manifest_path(parse_path)
        m = _json.load(open(mp))
        if m.get("reject_rows") != n_rejects:
            m["reject_rows"] = n_rejects
            with open(mp + ".tmp", "w") as f:
                _json.dump(m, f, indent=1)
            os.replace(mp + ".tmp", mp)
    except (OSError, _json.JSONDecodeError):
        pass
    _mark("parse")
    parse_fp = f"{fingerprint}/parse"

    # dims is the LAST artifact written, so (dims + edges) matching means
    # the whole chain (canonical included) completed for this fingerprint
    if manifest_matches(dims_path, parse_fp) and manifest_matches(edges_path, parse_fp):
        # same contract as a fresh run: the fresh path persists its stats
        # to build_stats.json, so resumed callers see identical keys
        stats: dict = {}
        try:
            stats = _json.load(open(os.path.join(out_dir, "build_stats.json")))
        except (OSError, _json.JSONDecodeError):
            pass
        return {
            "equivalences_path": stats.get("equivalences_path"),
            "n_collapsed_methods": stats.get("n_collapsed_methods", 0),
            "link_regime": stats.get("link_regime"),
            "n_methods": stats.get("n_methods", 0),
            "n_stubs": stats.get("n_stubs", 0),
            "n_hot_keys": stats.get("n_hot_keys", 0),
            "n_dyn_fqns": stats.get("n_dyn_fqns", 0),
            "out_dir": out_dir,
            "nodes_path": nodes_paths(out_dir),
            "edges_path": edges_paths(out_dir),
            "edges_linked_path": edges_path,
            "dims_path": (
                os.path.join(dims_path, "rk=node")
                if os.path.isdir(os.path.join(dims_path, "rk=node"))
                else dims_path
            ),
            "parse_path": parse_path,
            "resumed": True,
        }

    # "node" kind now excludes METHOD/TYPE_DECL rows — they live in their
    # own mtnode partition (written by the parse stage)
    nodes_plain = lambda: read_union_split(parse_path, "node")  # noqa: E731
    # the LINK scan needs only the identity/linking columns — dropping
    # code/line/col/etc. halves the bytes moved through the linker
    # (code snippets dominate the node payload)
    _LINK_COLS = [
        "id", "label", "name", "full_name", "signature",
        "method_full_name", "type_full_name", "url",
        "dynamic_type_hint_full_name",
    ]
    nodes_for_link = lambda: ray.data.read_parquet(  # noqa: E731
        os.path.join(parse_path, "row_kind=node"), columns=_LINK_COLS
    )
    mt_ds = lambda: read_union_split(parse_path, "mtnode")  # noqa: E731

    # ---- stage: survey aggregation (distributed groupby, checkpointed) --
    # Replaces the driver-side polars pass over ALL partials (O(distinct
    # FQNs × batches) transfer + ~10s fixed driver time at 600k docs):
    # the per-kind partial counts are PIVOTED into columns map-side so
    # ONE Ray groupby(skey) aggregates everything the control plane and
    # the dims/stub synthesis need — per-kind counts (m/td/ty/ns/ca) and
    # the CallSummary min/max-arg stats — into the `survey_agg`
    # checkpoint.  The driver reads back only tiny filtered projections
    # (dup FQNs ≥2, hot keys ≥ threshold, counts); the stub anti-join
    # (ca_c>0 & m_c=0) becomes a column filter instead of a second
    # groupby.  The full key sets never touch the driver except in the
    # gated broadcast control plane below.
    import pyarrow.dataset as pads
    from ray.data.aggregate import Max as _AMax
    from ray.data.aggregate import Min as _AMin
    from ray.data.aggregate import Sum as _ASum

    svagg_path = os.path.join(out_dir, "survey_agg")
    _SN_SENTINEL = 1 << 31  # non-'ca' rows must not win the Min(sn)

    _SV_AGGS = [
        ("m_c", "sum"),
        ("td_c", "sum"),
        ("mb_c", "sum"),
        ("ty_c", "sum"),
        ("ns_c", "sum"),
        ("ca_c", "sum"),
        ("th_c", "sum"),
        ("im_c", "sum"),
        ("sn", "min"),
        ("sx", "max"),
    ]
    _SV_NAMES = [
        "skey", "m_c", "td_c", "mb_c", "ty_c", "ns_c", "ca_c", "th_c",
        "im_c", "sn", "sx",
    ]
    n_sv_buckets = max(8, num_partitions)

    def svagg_factory():
        import polars as pl

        def _local_combine(t: pa.Table) -> pa.Table:
            # select by NAME: pyarrow's keys-vs-aggregates column order
            # is version-dependent (same fix as bucketed_group_agg)
            g = t.group_by("skey").aggregate(_SV_AGGS)
            g = g.select(["skey"] + [f"{c_}_{f_}" for c_, f_ in _SV_AGGS])
            return g.rename_columns(_SV_NAMES)

        def _pivot(b: pa.Table) -> pa.Table:
            kind = b.column("skind")
            zero = pa.scalar(0, pa.int64())

            def cnt(k: str):
                return pc.if_else(pc.equal(kind, k), b.column("sc"), zero)

            # 'ca' and 'th' rows both carry call-site arg stats
            is_ca = pc.is_in(kind, value_set=pa.array(["ca", "th"]))
            t = pa.table(
                {
                    "skey": b.column("skey"),
                    "m_c": cnt("m"),
                    "td_c": cnt("td"),
                    "mb_c": cnt("mb"),
                    "ty_c": cnt("ty"),
                    "ns_c": cnt("ns"),
                    "ca_c": cnt("ca"),
                    "th_c": cnt("th"),
                    "im_c": cnt("im"),
                    "sn": pc.if_else(
                        is_ca, b.column("sn"), pa.scalar(_SN_SENTINEL, pa.int64())
                    ),
                    "sx": pc.if_else(is_ca, b.column("sx"), zero),
                }
            )
            # map-side combine (pyarrow group_by — vectorized C++), then a
            # DETERMINISTIC key-hash bucket (polars fixed-seed hash; the
            # builtin hash() is salted per worker process and would split
            # one key across buckets)
            g = _local_combine(t)
            kh = (
                pl.from_arrow(g.column("skey").combine_chunks())
                .hash(seed=11)
                .to_numpy()
            )
            bucket = (kh % np.uint64(n_sv_buckets)).astype(np.int64)
            return g.append_column("bucket", pa.array(bucket, pa.int64()))

        def _bucket_combine(g: pa.Table) -> pa.Table:
            return _local_combine(g.drop(["bucket"]))

        def _rn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "skey": b.column("skey").cast(pa.string()),
                    "m_c": b.column("m_c").cast(pa.int64()),
                    "td_c": b.column("td_c").cast(pa.int64()),
                    "mb_c": b.column("mb_c").cast(pa.int64()),
                    "ty_c": b.column("ty_c").cast(pa.int64()),
                    "ns_c": b.column("ns_c").cast(pa.int64()),
                    "ca_c": b.column("ca_c").cast(pa.int64()),
                    "th_c": b.column("th_c").cast(pa.int64()),
                    "im_c": b.column("im_c").cast(pa.int64()),
                    "s_min": b.column("sn").cast(pa.int64()),
                    "s_max": b.column("sx").cast(pa.int64()),
                }
            )

        # combine -> bucket shuffle on a small int key -> vectorized
        # per-bucket combine.  Ray's built-in .aggregate() accumulates
        # per ROW in Python (measured 7.2s for 350k partial rows at
        # sf0.1); this shape is 2.7s and all the per-key work stays in
        # Arrow kernels.  Buckets scale with num_partitions, so per-group
        # size is distinct_keys/buckets regardless of corpus size.
        survey_src = ray.data.read_parquet(
            os.path.join(parse_path, "row_kind=survey"),
            columns=_KEEP["survey"],
            override_num_blocks=16,
        )
        return (
            survey_src.map_batches(_pivot, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_bucket_combine, batch_format="pyarrow")
            .map_batches(_rn, batch_format="pyarrow")
        )

    checkpoint(svagg_factory, svagg_path, "survey_agg", parse_fp)
    _svds = pads.dataset(svagg_path, format="parquet")

    def _sv_keys(flt) -> list[str]:
        return (
            _svds.to_table(columns=["skey"], filter=flt).column("skey").to_pylist()
        )

    _f = pads.field
    # NOTE: member (mb) dups are NOT canonical-renamed — the reference's
    # FullNameUniquenessPass covers methods/typedecls only; the member
    # index picks its canonical deterministically by sorted (fqn, id)
    # first-wins, so the dup shuffle need not move the (highly
    # duplicated) Type.field rows (measured +2s at sf0.1 when it did)
    dup_fqns = frozenset(_sv_keys((_f("m_c") >= 2) | (_f("td_c") >= 2)))
    n_methods = _svds.count_rows(filter=_f("m_c") > 0)
    n_mt = (
        n_methods
        + _svds.count_rows(filter=_f("td_c") > 0)
        + _svds.count_rows(filter=_f("mb_c") > 0)
    )
    n_calls = _svds.count_rows(filter=_f("ca_c") > 0)
    use_broadcast = (not force_shuffle_link) and n_methods <= broadcast_limit
    hot_keys = set(_sv_keys(_f("ca_c") >= hot_key_threshold))
    _mark("survey")

    # ---- stage: canonicalize (both regimes, fully distributed) --------
    # FullNameUniquenessPass analog: shuffle ONLY rows whose full_name
    # actually collides (the dup survey keeps the Sort input tiny), then
    # checkpoint — downstream consumers (index projection, node write,
    # equivalence stage) read Parquet instead of re-executing lineage,
    # and the driver never materializes METHOD/TYPE_DECL rows.
    canon_path = os.path.join(out_dir, "canonical_mt")
    if n_mt:
        dup_ref = ray.put(dup_fqns)

        def canonical_factory():
            mt_unique = mt_ds().map_batches(
                keyset_split_fn(dup_ref, "full_name", True), batch_format="pyarrow"
            )
            if not dup_fqns:
                return mt_unique
            mt_dups = (
                mt_ds()
                .map_batches(
                    keyset_split_fn(dup_ref, "full_name", False),
                    batch_format="pyarrow",
                )
                .groupby("full_name")
                .map_groups(canonicalize_group, batch_format="pyarrow")
            )
            return mt_unique.union(mt_dups)

        checkpoint(canonical_factory, canon_path, "canonical_mt", parse_fp)
        canonical_mt_for_write = ray.data.read_parquet(canon_path, columns=_LINK_COLS)
    else:
        canonical_mt_for_write = None
    _mark("canonicalize")

    # ---- stage: cross-fragment AstLinkerPass --------------------------
    # (reference `x2cpg/.../base/AstLinkerPass.scala:10-62`) children of
    # RENAMED duplicate TYPE_DECLs re-link to the canonical class so a
    # class reopened across documents yields ONE AST tree.  Distributed
    # bucketed join (both sides O(duplicated-class occurrences)); only
    # the per-distinct-name canonical-id map is broadcast.  Own small
    # edges root — unioning into the main link scan would break its
    # streaming fusion (measured 2x, see edges_spec note below).
    astlink_path = os.path.join(out_dir, "edges_astlink")
    if os.path.isdir(astlink_path):
        import shutil as _sh

        _sh.rmtree(astlink_path)
    td_dup_fqns = frozenset(_sv_keys(_f("td_c") >= 2))
    if n_mt and td_dup_fqns:
        from ..io.checkpoint import write_manifest as _wm
        from ..stages.link import ast_link_cross_fragment

        # parallel streamed filter (a serial pads.to_table here decoded
        # the whole canon table on the driver — a fixed Amdahl term)
        _td_arr = pa.array(sorted(td_dup_fqns), pa.string())

        def _td_pick(b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(b.column("label"), "TYPE_DECL"),
                pc.is_in(b.column("full_name"), value_set=_td_arr),
            )
            return b.filter(m).select(["full_name", "id"])

        canon_td_ids: dict = {}
        for _tb in (
            ray.data.read_parquet(canon_path, columns=["label", "full_name", "id"])
            .map_batches(_td_pick, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ):
            canon_td_ids.update(
                zip(_tb.column("full_name").to_pylist(), _tb.column("id").to_pylist())
            )
        if canon_td_ids:
            ast_link_cross_fragment(
                lambda: ray.data.read_parquet(
                    canon_path,
                    columns=[
                        "id", "label", "name", "full_name", "url", "fragment_idx",
                    ],
                ),
                td_dup_fqns,
                canon_td_ids,
            ).write_parquet(astlink_path)
            _wm(astlink_path, "edges_astlink", parse_fp, 0.0)
        _mark("astlink")

    # ---- stage: XInheritanceFullNamePass (cross-document) -------------
    # (reference `x2cpg/.../frontend/XInheritanceFullNamePass.scala:
    # 1-142`: short/import-qualified inherited names canonicalize to the
    # declaring TYPE_DECL's full name).  `class C(zoo.D)` records the
    # dotted base `zoo.D`; when `zoo` is an IMPORTED module the module
    # dimension (import-resolver pathway) resolves it to its doc and the
    # TYPE_DECL `D` defined there.  Produces (a) an alias map consumed
    # by BOTH dyn-closure regimes so override resolution crosses the
    # import, (b) corrective INHERITS_FROM edges (own tiny root).  All
    # probes are streamed small-set filters; the driver holds only hits.
    from ..stages.link import type_id as _type_id

    _imp_names_all = _sv_keys(_f("im_c") > 0)
    imported_all = {
        n.rsplit(".", 1)[0] if "." in n else n for n in _imp_names_all if n
    }
    imported_all |= {n for n in _imp_names_all if n}
    inherit_alias: dict[str, str] = {}
    _inherit_hits: list = []
    # demand gate (same discipline as the import resolver's): the 'ty'
    # survey kind carries ;-exploded inherits bases, so "any dotted type
    # key with an imported prefix" is decidable from a streamed svagg
    # scan — C corpora (stdio.h imports everywhere, no dotted bases)
    # never pay the canonical_mt scan below
    _inherit_demand = False
    if imported_all and n_mt:
        _imp_ref2 = ray.put(frozenset(imported_all))

        def _dotted_ty(b: pa.Table) -> pa.Table:
            import ray as _ray

            imps = _KEYSET_CACHE.get("s" + _imp_ref2.hex())
            if imps is None:
                imps = _ray.get(_imp_ref2)
                _KEYSET_CACHE["s" + _imp_ref2.hex()] = imps
            hit = b.filter(
                pc.and_(
                    pc.greater(b.column("ty_c"), 0),
                    pc.match_substring(
                        pc.coalesce(b.column("skey"), pa.scalar("")), "."
                    ),
                )
            )
            keep = [
                k
                for k in hit.column("skey").to_pylist()
                if k and "." in k and k.rsplit(".", 1)[0] in imps
            ]
            return pa.table({"k": pa.array(keep, pa.string())})

        for bb in (
            ray.data.read_parquet(svagg_path, columns=["skey", "ty_c"])
            .map_batches(_dotted_ty, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ):
            if bb.num_rows:
                _inherit_demand = True
                break
    if _inherit_demand:

        def _dotted_td(b: pa.Table) -> pa.Table:
            import ray as _ray

            imps = _KEYSET_CACHE.get("s" + _imp_ref2.hex())
            if imps is None:
                imps = _ray.get(_imp_ref2)
                _KEYSET_CACHE["s" + _imp_ref2.hex()] = imps
            m = pc.and_(
                pc.equal(b.column("label"), "TYPE_DECL"),
                pc.match_substring(
                    pc.coalesce(b.column("type_full_name"), pa.scalar("")), "."
                ),
            )
            hit = b.filter(m)
            ids, tfns = [], []
            for nid, tfn in zip(
                hit.column("id").to_pylist(), hit.column("type_full_name").to_pylist()
            ):
                if any(
                    "." in base and base.rsplit(".", 1)[0] in imps
                    for base in (tfn or "").split(";")
                ):
                    ids.append(nid)
                    tfns.append(tfn)
            return pa.table(
                {"id": pa.array(ids, pa.uint64()), "tfn": pa.array(tfns, pa.string())}
            )

        for bb in (
            ray.data.read_parquet(
                canon_path, columns=["id", "label", "type_full_name"]
            )
            .map_batches(_dotted_td, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ):
            _inherit_hits.extend(
                zip(bb.column("id").to_pylist(), bb.column("tfn").to_pylist())
            )
        want_bases = {
            base
            for _nid, tfn in _inherit_hits
            for base in tfn.split(";")
            if "." in base and base.rsplit(".", 1)[0] in imported_all
        }
        if want_bases:
            _mods = {b.rsplit(".", 1)[0] for b in want_bases}
            _mods_ref = ray.put(frozenset(_mods))

            def _mod_scan(b: pa.Table) -> pa.Table:
                import ray as _ray

                mods = _KEYSET_CACHE.get("s" + _mods_ref.hex())
                if mods is None:
                    mods = _ray.get(_mods_ref)
                    _KEYSET_CACHE["s" + _mods_ref.hex()] = mods
                rows_m, rows_u = [], []
                fl = b.filter(pc.equal(b.column("label"), "FILE"))
                for u in fl.column("url").to_pylist():
                    seg = (u or "").rstrip("/").rsplit("/", 1)[-1].split("?")[0]
                    stem = seg.rsplit(".", 1)[0] if "." in seg else seg
                    if stem in mods:
                        rows_m.append(stem)
                        rows_u.append(u)
                ns = b.filter(
                    pc.and_(
                        pc.equal(b.column("label"), "NAMESPACE_BLOCK"),
                        pc.is_in(
                            pc.coalesce(b.column("name"), pa.scalar("")),
                            value_set=pa.array(sorted(mods), pa.string()),
                        ),
                    )
                )
                rows_m += list(ns.column("name").to_pylist())
                rows_u += list(ns.column("url").to_pylist())
                return pa.table(
                    {
                        "mod": pa.array(rows_m, pa.string()),
                        "url": pa.array(rows_u, pa.string()),
                    }
                )

            _idim: dict[str, str] = {}
            for m_, u_ in sorted(
                (m_, u_)
                for bb in ray.data.read_parquet(
                    os.path.join(parse_path, "row_kind=node"),
                    columns=["label", "name", "url"],
                )
                .map_batches(_mod_scan, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
                for m_, u_ in zip(
                    bb.column("mod").to_pylist(), bb.column("url").to_pylist()
                )
            ):
                _idim.setdefault(m_, u_)
            _url_names = {
                (_idim[b.rsplit(".", 1)[0]], b.rsplit(".", 1)[1])
                for b in want_bases
                if b.rsplit(".", 1)[0] in _idim
            }
            if _url_names:
                _un_ref = ray.put(_url_names)

                def _td_probe(b: pa.Table) -> pa.Table:
                    import ray as _ray

                    uns = _KEYSET_CACHE.get("s" + _un_ref.hex())
                    if uns is None:
                        uns = _ray.get(_un_ref)
                        _KEYSET_CACHE["s" + _un_ref.hex()] = uns
                    tt = b.filter(
                        pc.and_(
                            pc.equal(b.column("label"), "TYPE_DECL"),
                            pc.invert(
                                pc.match_substring(
                                    pc.coalesce(b.column("full_name"), pa.scalar("")),
                                    "<duplicate>",
                                )
                            ),
                        )
                    )
                    keep = [
                        i
                        for i, (u_, n_) in enumerate(
                            zip(
                                tt.column("url").to_pylist(),
                                tt.column("name").to_pylist(),
                            )
                        )
                        if (u_, n_) in uns
                    ]
                    tt = tt.take(keep) if keep else tt.slice(0, 0)
                    return pa.table(
                        {
                            "url": tt.column("url"),
                            "name": tt.column("name"),
                            "full_name": tt.column("full_name"),
                        }
                    )

                _td_by: dict[tuple, str] = {}
                for u_, n_, fn_ in sorted(
                    (u_, n_, fn_)
                    for bb in ray.data.read_parquet(
                        canon_path, columns=["label", "name", "full_name", "url"]
                    )
                    .map_batches(_td_probe, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow", batch_size=None)
                    for u_, n_, fn_ in zip(
                        bb.column("url").to_pylist(),
                        bb.column("name").to_pylist(),
                        bb.column("full_name").to_pylist(),
                    )
                ):
                    _td_by.setdefault((u_, n_), fn_)
                for b in want_bases:
                    m_, t_ = b.rsplit(".", 1)
                    if m_ in _idim and (_idim[m_], t_) in _td_by:
                        cand = _td_by[(_idim[m_], t_)]
                        if cand != b:
                            inherit_alias[b] = cand
    inherit_path = os.path.join(out_dir, "edges_inherit")
    if os.path.isdir(inherit_path):
        import shutil as _sh2

        _sh2.rmtree(inherit_path)
    if inherit_alias:
        import pyarrow.parquet as _pq

        from ..io.checkpoint import write_manifest as _wm2

        _ie = sorted(
            (nid, _type_id(inherit_alias[base]))
            for nid, tfn in _inherit_hits
            for base in tfn.split(";")
            if base in inherit_alias
        )
        _iet = pa.table(
            {
                "subj": pa.array([s for s, _o in _ie], pa.uint64()),
                "pred": pa.array(["INHERITS_FROM"] * len(_ie), pa.string()),
                "obj": pa.array([o for _s, o in _ie], pa.uint64()),
                "variable": pa.nulls(len(_ie), pa.string()),
            },
            schema=EDGES_SCHEMA,
        )
        os.makedirs(inherit_path, exist_ok=True)
        _pq.write_table(_iet, os.path.join(inherit_path, "data.parquet"))
        _wm2(inherit_path, "edges_inherit", parse_fp, 0.0)
    _mark("inherit_fullname")

    # ---- stage: link --------------------------------------------------
    # The TYPE_DECL inheritance projection (hierarchy for SAFEDISPATCH
    # dynamic dispatch) is read driver-side straight off the canonical
    # checkpoint's Parquet footers+columns — tiny (only declarations
    # participating in inheritance), no Ray execution.
    link_regime = "broadcast" if use_broadcast else "salted_shuffle"
    from ..stages.link import (
        build_dyn_candidates,
        dyn_candidates_distributed,
        dyn_table_to_map,
    )

    # Control plane (SAFEDISPATCH candidates + NaiveCallLinker).  Two
    # regimes (parity-tested, tests/test_dynlink_distributed.py):
    # - driver (below JOERN_RAY_DYN_GATE): collect the survey key sets
    #   (O(distinct method+call FQNs)) and walk the hierarchy in-memory.
    # - distributed (above the gate): the iterative INHERITS_FROM
    #   self-join (SURVEY.md §2.4 row 3) — doubling closure over the
    #   TYPE_DECL hierarchy + candidate/naive joins, all as Dataset
    #   joins; only the RESULT (O(dyn candidate pairs), the broadcast
    #   side both link regimes consume) reaches the driver.  Dynamic
    #   dispatch no longer silently degrades past the gate.
    def _apply_inherit_alias(t: pa.Table) -> pa.Table:
        """Rewrite ;-joined inherits lists through the cross-document
        alias map (unique-value rewrite + dictionary scatter) so the
        hierarchy closure sees canonical base names in BOTH regimes."""
        if not inherit_alias or t.num_rows == 0:
            return t
        col = t.column("type_full_name")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        d = pc.dictionary_encode(col)
        uniq = d.dictionary.to_pylist()

        def rw(v):
            if not v or "." not in v:
                return v
            return ";".join(inherit_alias.get(p_, p_) for p_ in v.split(";"))

        new_col = pa.DictionaryArray.from_arrays(
            d.indices, pa.array([rw(v) for v in uniq], pa.string())
        ).cast(pa.string())
        return t.set_column(
            t.schema.get_field_index("type_full_name"), "type_full_name", new_col
        )

    dyn_driver_gate = int(os.environ.get("JOERN_RAY_DYN_GATE", 20_000_000))
    dyn_regime = (
        "driver" if n_methods + n_calls <= dyn_driver_gate else "distributed"
    )
    if dyn_regime == "driver":
        if n_mt:
            # parallel streamed filter (serial pads.to_table decoded the
            # whole canon table driver-side)
            def _td_proj_pick(b: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.equal(b.column("label"), "TYPE_DECL"),
                    pc.not_equal(
                        pc.coalesce(b.column("type_full_name"), pa.scalar("")), ""
                    ),
                )
                return b.filter(m)

            _td_parts = list(
                ray.data.read_parquet(
                    canon_path, columns=["label", "full_name", "type_full_name"]
                )
                .map_batches(_td_proj_pick, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )
            td_proj = (
                pa.concat_tables(_td_parts)
                if _td_parts
                else pa.table(
                    {
                        "label": pa.array([], pa.string()),
                        "full_name": pa.array([], pa.string()),
                        "type_full_name": pa.array([], pa.string()),
                    }
                )
            )
        else:
            td_proj = pa.table(
                {
                    "label": pa.array([], pa.string()),
                    "full_name": pa.array([], pa.string()),
                    "type_full_name": pa.array([], pa.string()),
                }
            )
        td_proj = _apply_inherit_alias(td_proj)
        known = frozenset(_sv_keys(_f("m_c") > 0))
        ca_fqns = _sv_keys(_f("ca_c") > 0)
        dyn_fqn = build_dyn_candidates(td_proj, ca_fqns, known)
        # ImportResolverPass analog (reference `x2cpg/.../frontendspecific/
        # pysrc2cpg/ImportsPass + PythonImportResolverPass`): build a
        # (module path -> defining doc) dimension from FILE rows (url
        # stem = module path, the reference's filename convention) and
        # NAMESPACE_BLOCK package names (go), then resolve unresolved
        # `m.f` calls whose prefix m is an IMPORTED module to the METHOD
        # named f DEFINED IN that doc — candidates ride the dyn map so
        # both link regimes emit the edges.  Runs before the naive
        # fallback: module-precise resolution beats unique-name luck,
        # and covers the case naive cannot (f defined in several docs).
        # all projections STREAMED (distributed filter, only hits reach
        # the driver) — a driver-side pads scan of the full node split
        # decodes O(graph) string columns single-threaded (measured tens
        # of seconds at 600k docs)
        def _node_proj(keep_label: str, cols: list, extra=None):
            import ray.data as _rd2

            def f(b: pa.Table) -> pa.Table:
                m = pc.equal(b.column("label"), keep_label)
                if extra is not None:
                    m = pc.and_(m, extra(b))
                return b.filter(m).select(cols)

            out = []
            for bb in (
                _rd2.read_parquet(
                    os.path.join(parse_path, "row_kind=node"),
                    columns=["label"] + cols,
                )
                .map_batches(f, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
            ):
                if bb.num_rows:
                    out.append(bb)
            return (
                pa.concat_tables(out)
                if out
                else pa.table({c: pa.array([], pa.string()) for c in cols})
            )

        _imp_names = _sv_keys(_f("im_c") > 0)
        imported = {n.rsplit(".", 1)[0] if "." in n else n for n in _imp_names if n}
        imported |= {n for n in _imp_names if n}
        # demand gate BEFORE the module-dimension scans: only when some
        # UNRESOLVED call actually carries an imported prefix do the
        # FILE/NAMESPACE projections run (library includes like stdio.h
        # are imported in every C corpus but resolve nothing — without
        # this gate two node-split scans ran on every build, ~3s at
        # sf0.1)
        pre_want: dict[str, tuple[str, str]] = {}
        if imported:
            for fqn in ca_fqns:
                if fqn in known or fqn in dyn_fqn or "." not in fqn:
                    continue
                mname, f = fqn.rsplit(".", 1)
                if mname in imported:
                    pre_want[fqn] = (mname, f)
        if pre_want:
            _file_t = _node_proj("FILE", ["url"])

            def _stem(u: str) -> str:
                seg = u.rstrip("/").rsplit("/", 1)[-1].split("?")[0]
                return seg.rsplit(".", 1)[0] if "." in seg else seg

            module_dim: dict[str, str] = {}
            for u in sorted(set(_file_t.column("url").to_pylist())):
                module_dim.setdefault(_stem(u), u)
            _ns_t = _node_proj(
                "NAMESPACE_BLOCK",
                ["name", "url"],
                extra=lambda b: pc.not_equal(
                    pc.coalesce(b.column("name"), pa.scalar("")), "<global>"
                ),
            )
            for nm, u in sorted(
                zip(_ns_t.column("name").to_pylist(), _ns_t.column("url").to_pylist())
            ):
                if nm and u:
                    module_dim.setdefault(nm, u)
            want: dict[str, tuple[str, str]] = {
                fqn: (module_dim[mname], f)
                for fqn, (mname, f) in pre_want.items()
                if mname in module_dim
            }
            if want and n_mt:
                _urls = pa.array(sorted({u for u, _f2 in want.values()}), pa.string())
                _meth_t = pads.dataset(canon_path, format="parquet").to_table(
                    columns=["label", "name", "full_name", "url"],
                    filter=(pads.field("label") == "METHOD")
                    & pads.field("url").isin(_urls),
                )
                by_url_name: dict[tuple[str, str], list[str]] = {}
                for u, nm, fn_ in sorted(
                    zip(
                        _meth_t.column("url").to_pylist(),
                        _meth_t.column("name").to_pylist(),
                        _meth_t.column("full_name").to_pylist(),
                    )
                ):
                    by_url_name.setdefault((u, nm), []).append(fn_)
                for fqn, (u, f) in want.items():
                    cands = by_url_name.get((u, f))
                    if cands:
                        dyn_fqn[fqn] = cands
        # SymbolTable iteration 2 (reference `XTypeRecovery.scala:25,
        # 151-177` runs exactly two passes so linker-recovered RETURN
        # types feed back into receiver typing): `x = f(); x.g()`
        # surfaces as the symbolic call fqn `<ret:f>.g`; resolve f's
        # return type T off the canonical method signatures and emit
        # the `T.g` candidate — a resolution iteration 1 cannot make
        # when f lives in another document.
        _ret_want: dict[str, tuple[str, str]] = {}
        for fqn in ca_fqns:
            if fqn.startswith("<ret:") and ">." in fqn and fqn not in dyn_fqn:
                f_name = fqn[len("<ret:"):fqn.index(">.")]
                g_name = fqn[fqn.index(">.") + 2:]
                if f_name in known and g_name:
                    _ret_want[fqn] = (f_name, g_name)
        if _ret_want and n_mt:
            from ..stages.link import _ret_type_of

            _farr = pa.array(sorted({f for f, _g in _ret_want.values()}), pa.string())
            _sig_t = pads.dataset(canon_path, format="parquet").to_table(
                columns=["label", "full_name", "signature"],
                filter=(pads.field("label") == "METHOD")
                & pads.field("full_name").isin(_farr),
            )
            _sig_by_fqn = dict(
                zip(
                    _sig_t.column("full_name").to_pylist(),
                    _sig_t.column("signature").to_pylist(),
                )
            )
            for fqn, (f_name, g_name) in _ret_want.items():
                rt = _ret_type_of(_sig_by_fqn.get(f_name))
                if rt:
                    cand = f"{rt}.{g_name}"
                    if cand in known:
                        dyn_fqn[fqn] = [cand]
        # NaiveCallLinker fallback (reference `NaiveCallLinker.scala:
        # 12-29`): a dotted call fqn that neither resolves by full name
        # nor by dynamic dispatch links to the UNIQUE known method
        # sharing its terminal name (ambiguous names stay stubs).
        # Riding the dyn-candidate machinery makes both link regimes
        # handle it identically.
        name_to_fqns: dict[str, list[str]] = {}
        for f in known:
            name_to_fqns.setdefault(f.rsplit(".", 1)[-1], []).append(f)
        for fqn in ca_fqns:
            if (
                fqn in known
                or fqn in dyn_fqn
                or "." not in fqn
                or fqn.startswith("<operator>")
            ):
                continue
            cands = name_to_fqns.get(fqn.rsplit(".", 1)[-1])
            if cands and len(cands) == 1:
                dyn_fqn[fqn] = [cands[0]]
        unres_ret = any(
            f.startswith("<ret:") and f not in dyn_fqn for f in ca_fqns
        )
    else:
        if n_mt:

            def _td_filter(b: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.equal(b.column("label"), "TYPE_DECL"),
                    pc.not_equal(
                        pc.coalesce(b.column("type_full_name"), pa.scalar("")), ""
                    ),
                )
                # inherit_alias is a small dict captured in the task
                # closure (one entry per import-qualified base name)
                return _apply_inherit_alias(
                    b.filter(m).select(["full_name", "type_full_name"])
                )

            td_ds = ray.data.read_parquet(
                canon_path, columns=["label", "full_name", "type_full_name"]
            ).map_batches(_td_filter, batch_format="pyarrow")
        else:
            td_ds = ray.data.from_arrow(
                pa.table(
                    {
                        "full_name": pa.array([], pa.string()),
                        "type_full_name": pa.array([], pa.string()),
                    }
                )
            )

        def _skey_pick(col: str):
            def f(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "fqn": b.filter(
                            pc.greater(b.column(col), 0)
                        ).column("skey")
                    }
                )

            return f

        sv_cols = ray.data.read_parquet(svagg_path, columns=["skey", "m_c", "ca_c"])
        dyn_fqn = dyn_table_to_map(
            dyn_candidates_distributed(
                td_ds,
                sv_cols.map_batches(_skey_pick("ca_c"), batch_format="pyarrow"),
                sv_cols.map_batches(_skey_pick("m_c"), batch_format="pyarrow"),
            )
        )
        # Import-resolver + <ret:f> iteration-2 in the DISTRIBUTED
        # regime: every probe set here is SMALL (distinct import names,
        # ret-hint fqns, resolved module urls), so each step is a
        # streamed broadcast-filtered scan collecting only hits — the
        # driver never holds anything of O(fqns) or O(docs).
        _imp_names = _sv_keys(_f("im_c") > 0)  # O(distinct imports)
        imported = {n.rsplit(".", 1)[0] if "." in n else n for n in _imp_names if n}
        imported |= {n for n in _imp_names if n}
        dyn_keyset = frozenset(dyn_fqn)
        if imported:
            imp_ref = ray.put(frozenset(imported))

            # unresolved dotted call fqns whose PREFIX is imported —
            # streamed over the survey, only hits collected
            def _want_pick(b: pa.Table) -> pa.Table:
                import ray as _ray

                imps = _KEYSET_CACHE.get("s" + imp_ref.hex())
                if imps is None:
                    imps = _ray.get(imp_ref)
                    _KEYSET_CACHE["s" + imp_ref.hex()] = imps
                hit = b.filter(
                    pc.and_(pc.greater(b.column("ca_c"), 0), pc.equal(b.column("m_c"), 0))
                )
                keep = [
                    k
                    for k in hit.column("skey").to_pylist()
                    if k and "." in k and k.rsplit(".", 1)[0] in imps
                ]
                return pa.table({"fqn": pa.array(keep, pa.string())})

            want_fqns = sorted(
                set(
                    x
                    for bb in ray.data.read_parquet(
                        svagg_path, columns=["skey", "m_c", "ca_c"]
                    )
                    .map_batches(_want_pick, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow", batch_size=None)
                    for x in bb.column("fqn").to_pylist()
                )
                - dyn_keyset
            )
            if want_fqns:
                # module dim restricted to the imported names: streamed
                # FILE-stem + NAMESPACE_BLOCK scans, only matches collected
                def _mod_pick(b: pa.Table) -> pa.Table:
                    import ray as _ray

                    imps = _KEYSET_CACHE.get("s" + imp_ref.hex())
                    if imps is None:
                        imps = _ray.get(imp_ref)
                        _KEYSET_CACHE["s" + imp_ref.hex()] = imps
                    rows_m, rows_u = [], []
                    fl = b.filter(pc.equal(b.column("label"), "FILE"))
                    for u in fl.column("url").to_pylist():
                        seg = (u or "").rstrip("/").rsplit("/", 1)[-1].split("?")[0]
                        stem = seg.rsplit(".", 1)[0] if "." in seg else seg
                        if stem in imps:
                            rows_m.append(stem)
                            rows_u.append(u)
                    ns = b.filter(
                        pc.and_(
                            pc.equal(b.column("label"), "NAMESPACE_BLOCK"),
                            pc.is_in(
                                pc.coalesce(b.column("name"), pa.scalar("")),
                                value_set=pa.array(sorted(imps), pa.string()),
                            ),
                        )
                    )
                    rows_m += [n_ for n_ in ns.column("name").to_pylist()]
                    rows_u += [u_ for u_ in ns.column("url").to_pylist()]
                    return pa.table(
                        {
                            "mod": pa.array(rows_m, pa.string()),
                            "url": pa.array(rows_u, pa.string()),
                        }
                    )

                module_dim: dict[str, str] = {}
                pairs = sorted(
                    (m_, u_)
                    for bb in ray.data.read_parquet(
                        os.path.join(parse_path, "row_kind=node"),
                        columns=["label", "name", "url"],
                    )
                    .map_batches(_mod_pick, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow", batch_size=None)
                    for m_, u_ in zip(
                        bb.column("mod").to_pylist(), bb.column("url").to_pylist()
                    )
                )
                for m_, u_ in pairs:
                    module_dim.setdefault(m_, u_)
                want = {
                    fqn: (module_dim[fqn.rsplit(".", 1)[0]], fqn.rsplit(".", 1)[1])
                    for fqn in want_fqns
                    if fqn.rsplit(".", 1)[0] in module_dim
                }
                if want and n_mt:
                    url_name = {(u_, f_) for u_, f_ in want.values()}
                    un_ref = ray.put(url_name)

                    def _meth_pick(b: pa.Table) -> pa.Table:
                        import ray as _ray

                        uns = _KEYSET_CACHE.get("s" + un_ref.hex())
                        if uns is None:
                            uns = _ray.get(un_ref)
                            _KEYSET_CACHE["s" + un_ref.hex()] = uns
                        mm = b.filter(pc.equal(b.column("label"), "METHOD"))
                        keep = [
                            i
                            for i, (u_, n_) in enumerate(
                                zip(
                                    mm.column("url").to_pylist(),
                                    mm.column("name").to_pylist(),
                                )
                            )
                            if (u_, n_) in uns
                        ]
                        mm = mm.take(keep) if keep else mm.slice(0, 0)
                        return pa.table(
                            {
                                "url": mm.column("url"),
                                "name": mm.column("name"),
                                "full_name": mm.column("full_name"),
                            }
                        )

                    by_url_name: dict[tuple, list] = {}
                    rows = sorted(
                        (u_, n_, fn_)
                        for bb in ray.data.read_parquet(
                            canon_path,
                            columns=["label", "name", "full_name", "url"],
                        )
                        .map_batches(_meth_pick, batch_format="pyarrow")
                        .iter_batches(batch_format="pyarrow", batch_size=None)
                        for u_, n_, fn_ in zip(
                            bb.column("url").to_pylist(),
                            bb.column("name").to_pylist(),
                            bb.column("full_name").to_pylist(),
                        )
                    )
                    for u_, n_, fn_ in rows:
                        by_url_name.setdefault((u_, n_), []).append(fn_)
                    for fqn, (u_, f_) in want.items():
                        cands = by_url_name.get((u_, f_))
                        if cands:
                            dyn_fqn[fqn] = cands
        # <ret:f>.g keys — streamed prefix filter over the survey
        def _ret_pick(b: pa.Table) -> pa.Table:
            hit = b.filter(
                pc.and_(
                    pc.greater(b.column("ca_c"), 0),
                    pc.starts_with(
                        pc.coalesce(b.column("skey"), pa.scalar("")), "<ret:"
                    ),
                )
            )
            return pa.table({"fqn": hit.column("skey")})

        _ret_fqns = sorted(
            set(
                x
                for bb in ray.data.read_parquet(
                    svagg_path, columns=["skey", "ca_c"]
                )
                .map_batches(_ret_pick, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
                for x in bb.column("fqn").to_pylist()
            )
            - frozenset(dyn_fqn)
        )
        _ret_want2: dict[str, tuple[str, str]] = {}
        for fqn in _ret_fqns:
            if ">." in fqn:
                f_name = fqn[len("<ret:"):fqn.index(">.")]
                g_name = fqn[fqn.index(">.") + 2:]
                if f_name and g_name:
                    _ret_want2[fqn] = (f_name, g_name)
        if _ret_want2 and n_mt:
            from ..stages.link import _ret_type_of

            _fset = pa.array(sorted({f_ for f_, _g in _ret_want2.values()}), pa.string())

            def _sig_pick(b: pa.Table) -> pa.Table:
                mm = b.filter(
                    pc.and_(
                        pc.equal(b.column("label"), "METHOD"),
                        pc.is_in(b.column("full_name"), value_set=_fset),
                    )
                )
                return pa.table(
                    {
                        "full_name": mm.column("full_name"),
                        "signature": mm.column("signature"),
                    }
                )

            _sig_by = {}
            for bb in (
                ray.data.read_parquet(
                    canon_path, columns=["label", "full_name", "signature"]
                )
                .map_batches(_sig_pick, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
            ):
                _sig_by.update(
                    zip(
                        bb.column("full_name").to_pylist(),
                        bb.column("signature").to_pylist(),
                    )
                )
            # known-membership for the candidate: cand must be a real
            # method — verify via a second tiny streamed filter
            _cands = {}
            for fqn, (f_name, g_name) in _ret_want2.items():
                rt = _ret_type_of(_sig_by.get(f_name))
                if rt:
                    _cands[fqn] = f"{rt}.{g_name}"
            if _cands:
                _carr = pa.array(sorted(set(_cands.values())), pa.string())

                def _known_pick(b: pa.Table) -> pa.Table:
                    mm = b.filter(
                        pc.and_(
                            pc.equal(b.column("label"), "METHOD"),
                            pc.is_in(b.column("full_name"), value_set=_carr),
                        )
                    )
                    return pa.table({"full_name": mm.column("full_name")})

                _known_c: set = set()
                for bb in (
                    ray.data.read_parquet(canon_path, columns=["label", "full_name"])
                    .map_batches(_known_pick, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow", batch_size=None)
                ):
                    _known_c.update(bb.column("full_name").to_pylist())
                for fqn, cand in _cands.items():
                    if cand in _known_c:
                        dyn_fqn[fqn] = [cand]
        unres_ret = any(f not in dyn_fqn for f in _ret_fqns)
    dyn_ref = ray.put(dyn_fqn)
    _mark("control_plane")
    if use_broadcast:
        # broadcast regime: collect ONLY the 3-column method index
        # projection (not full rows), ship it ONCE via ray.put — workers
        # build the fqn->id dict once per process (per-worker cache).
        # The projection is decoded by a PARALLEL Ray read (driver only
        # concatenates buffers) — a serial pads scan was ~2.3 s at 600k
        # docs, and the round-5 attempt to defer the whole build to
        # workers (path spec) thrashed: 32 processes × 32-thread scans
        # re-decoding the same 150 files took the 600k edge phase from
        # 98 s to 327 s.  Measured, reverted.
        _empty_idx = pa.table(
            {
                "full_name": pa.array([], pa.string()),
                "id": pa.array([], pa.uint64()),
                "signature": pa.array([], pa.string()),
            }
        )
        if n_mt:
            # ONE parallel pass projects BOTH broadcast indexes — METHOD
            # (fqn, id, signature) for the call linker and MEMBER
            # (fqn, id) for FieldAccessLinkerPass.  The previous serial
            # pads scan for MEMBER re-decoded the whole canon table on
            # the driver (~3 s at 600k docs, a fixed Amdahl term).
            _ML = pa.array(["METHOD", "MEMBER"])

            def _idx_proj(b: pa.Table) -> pa.Table:
                m = pc.is_in(b.column("label"), value_set=_ML)
                return b.filter(m).select(["label", "full_name", "id", "signature"])

            idx_parts = list(
                ray.data.read_parquet(
                    canon_path, columns=["label", "full_name", "id", "signature"]
                )
                .map_batches(_idx_proj, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )
            both = (
                pa.concat_tables(idx_parts)
                if idx_parts
                else _empty_idx.append_column("label", pa.array([], pa.string()))
            )
            is_m = pc.equal(both.column("label"), "METHOD")
            idx_t = both.filter(is_m).select(["full_name", "id", "signature"])
            # canonical names are unique; sort for deterministic layout
            index_table = idx_t.take(
                pc.sort_indices(idx_t, sort_keys=[("full_name", "ascending")])
            )
            mem_t = both.filter(
                pc.and_(
                    pc.equal(both.column("label"), "MEMBER"),
                    pc.not_equal(pc.coalesce(both.column("full_name"), pa.scalar("")), ""),
                )
            ).select(["full_name", "id"])
            mem_t = mem_t.take(
                pc.sort_indices(
                    mem_t,
                    sort_keys=[("full_name", "ascending"), ("id", "ascending")],
                )
            )
        else:
            index_table = _empty_idx
            mem_t = pa.table(
                {"full_name": pa.array([], pa.string()), "id": pa.array([], pa.uint64())}
            )
        index_ref = ray.put(index_table)
        member_ref = ray.put(mem_t)
        _mark("index_projection")
    else:

        def calls_proj():
            from ..stages.link import hint_fact_rows

            def _f(batch: pa.Table) -> pa.Table:
                m = pc.is_in(
                    batch.column("label"), value_set=pa.array(["CALL", "METHOD_REF"])
                )
                # full_name carries the FieldAccessLinkerPass Type.field
                # probe on fieldAccess operator calls
                out = batch.filter(m).select(
                    ["id", "label", "method_full_name", "full_name"]
                )
                # synthetic per-hint fact rows (XTypeHintCallLinker) ride
                # the same salted join as ordinary calls
                hr = hint_fact_rows(batch)
                if hr.num_rows:
                    hr = hr.append_column(
                        "full_name", pa.nulls(hr.num_rows, pa.string())
                    )
                    out = pa.concat_tables([out, hr], promote_options="default")
                return out

            return nodes_plain().map_batches(_f, batch_format="pyarrow")

        link_edges = salted_call_link(
            calls_proj(),
            ray.data.read_parquet(
                canon_path, columns=["id", "label", "full_name", "signature"]
            )
            if n_mt
            else ray.data.from_arrow(NODES_SCHEMA.empty_table()),
            hot_keys=hot_keys,
            n_salts=n_salts,
            dyn_fqn_ref=dyn_ref,
        )

    # ---- dimensions + stubs: DISTRIBUTED synthesis over the aggregated
    # survey (round-2 verdict #1b: the O(distinct FQNs) dim/stub row
    # construction was the driver's largest remaining serial term).
    # The pivoted survey_agg already carries per-kind counts per key, so
    # this is ONE pure map over its Parquet files — TYPE rows from
    # ty_c>0, NAMESPACE from ns_c>0, stubs from the anti-join filter
    # ca_c>0 & m_c=0 minus dyn-resolved keys.  No groupby, no key set
    # collected, no extra shuffle.
    import pyarrow.parquet as pq

    from ..io.checkpoint import write_manifest
    from ..stages.link import (
        dim_nodes_batch,
        stub_nodes_batch,
        typedecl_stub_batch,
        typedecl_stub_id,
    )

    dyn_keys_ref = ray.put(pa.array(sorted(dyn_fqn.keys()), pa.string()))

    def _build_dims():
        import ray.data as _rd

        meta_t = rows_to_table(
            [
                {
                    "id": hash64("META_DATA", user_fingerprint),
                    "label": "META_DATA",
                    "name": "joern_ray",
                    "full_name": user_fingerprint,
                    "signature": _ENGINE_VERSION,
                    # overlays present in this build (reference
                    # `MetaDataPass.scala:15-39` records language+overlays)
                    "code": "base;cfg;dominators;cdg;reachingdef;contains;linking;typerel;dedup",
                    "lang": "c;cpp;java;javascript;python;go;ruby;php;kotlin;csharp;rust;swift",
                    "order": 0,
                    "argument_index": -1,
                    "line": -1,
                    "col": -1,
                }
            ],
            NODES_SCHEMA,
        )

        def _dims_batch(b: pa.Table) -> pa.Table:
            import ray as _ray

            keys = b.column("skey").cast(pa.string())
            out = []
            ty = b.filter(pc.greater(b.column("ty_c"), 0))
            if ty.num_rows:
                out.append(
                    dim_nodes_batch(
                        [k for k in ty.column("skey").to_pylist() if k],
                        "TYPE",
                        type_id,
                    )
                )
            ns = b.filter(pc.greater(b.column("ns_c"), 0))
            if ns.num_rows:
                out.append(
                    dim_nodes_batch(
                        [k for k in ns.column("skey").to_pylist() if k],
                        "NAMESPACE",
                        namespace_id,
                    )
                )
            # TypeDeclStubCreator: referenced-but-undeclared types get an
            # external TYPE_DECL stub (the REF edge from the TYPE
            # dimension rides the fused spec-edge half below)
            tds_ = b.filter(
                pc.and_(pc.greater(b.column("ty_c"), 0), pc.equal(b.column("td_c"), 0))
            )
            if tds_.num_rows:
                out.append(
                    typedecl_stub_batch(
                        [k for k in tds_.column("skey").to_pylist() if k]
                    )
                )
            # stubs: unresolved call fqns PLUS unmatched type hints
            # (XTypeHintCallLinker's anti-join feeding MethodStubCreator,
            # `XTypeHintCallLinker.scala:45-64,107-123`)
            keep = pc.and_(
                pc.greater(pc.add(b.column("ca_c"), b.column("th_c")), 0),
                pc.equal(b.column("m_c"), 0),
            )
            # unresolved `<ret:f>.g` sentinels never materialize as stub
            # names (ADVICE r4): they collapse onto the single
            # <unknownFullName> stub emitted with meta_t below
            keep = pc.and_(keep, pc.invert(pc.starts_with(keys, "<ret:")))
            dk = _KEYSET_CACHE.get(dyn_keys_ref.hex())
            if dk is None:
                dk = _ray.get(dyn_keys_ref)
                _KEYSET_CACHE[dyn_keys_ref.hex()] = dk
            if len(dk):
                keep = pc.and_(keep, pc.invert(pc.is_in(keys, value_set=dk)))
            s = b.filter(keep)
            if s.num_rows:
                fqns = [k for k in s.column("skey").to_pylist() if k]
                ax = dict(
                    zip(s.column("skey").to_pylist(), s.column("s_max").to_pylist())
                )
                out.append(stub_nodes_batch(fqns, ax))
            if not out:
                return NODES_SCHEMA.empty_table()
            return pa.concat_tables(out)

        # speculative-method namespace (reference
        # `XTypeHintCallLinker.scala:166-183`): present iff any hint-only
        # stub exists; the AST edges to it are emitted with the edge write
        if _svds.count_rows(
            filter=(_f("th_c") > 0) & (_f("m_c") == 0) & (_f("ca_c") == 0)
        ):
            meta_t = pa.concat_tables(
                [
                    meta_t,
                    dim_nodes_batch(
                        ["<speculatedMethods>"], "NAMESPACE", namespace_id
                    ),
                ]
            )
        # the ONE shared stub every unresolved `<ret:` call links to
        # (CallLinker._primary / join_group rewrite the edge target)
        if unres_ret:
            meta_t = pa.concat_tables(
                [meta_t, stub_nodes_batch(["<unknownFullName>"], {})]
            )
        # ONE execution writes BOTH outputs (round-3 verdict #9: fewer
        # Dataset executions): node-shaped dim/stub rows and the
        # <speculatedMethods> AST edges ride a padded union schema and
        # split at the sink via hive partitioning on `rk` —
        # dims/rk=node joins nodes_paths(), dims/rk=edge joins
        # edges_paths().  (They must NOT union into the main link scan:
        # a Dataset.union breaks its streaming fusion, measured 2x.)
        _USCHEMA = pa.schema(
            list(NODES_SCHEMA) + list(EDGES_SCHEMA) + [pa.field("rk", pa.string())]
        )

        def _pad(t: pa.Table, rk: str) -> pa.Table:
            arrays = []
            for f_ in _USCHEMA:
                if f_.name == "rk":
                    arrays.append(pa.array([rk] * t.num_rows, pa.string()))
                elif f_.name in t.column_names:
                    arrays.append(t.column(f_.name).combine_chunks().cast(f_.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, f_.type))
            return pa.Table.from_arrays(arrays, schema=_USCHEMA)

        def _dims_and_spec(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [_pad(_dims_batch(b), "node"), _pad(_spec_ast(b), "edge")]
            )

        dims_ds = _rd.from_arrow(_pad(meta_t, "node")).union(
            _rd.read_parquet(
                svagg_path,
                columns=["skey", "m_c", "td_c", "ty_c", "ns_c", "ca_c", "th_c", "s_max"],
            ).map_batches(_dims_and_spec, batch_format="pyarrow")
        )
        import shutil as _shutil

        if os.path.isdir(dims_path):
            _shutil.rmtree(dims_path)
        dims_ds.write_parquet(dims_path, partition_cols=["rk"])
    # dims manifest written AFTER the writes below complete (it is the
    # completion marker for the whole chain)

    def all_nodes():
        """Column-pruned union of plain + canonical nodes feeding the
        linker (nothing else consumes this)."""
        base = nodes_for_link()
        if canonical_mt_for_write is not None:
            base = base.union(canonical_mt_for_write)
        return base

    if use_broadcast:
        # fused: CALL/REF resolution + map-side dimension links in ONE
        # scan of the node stream.  Plain TASKS (instant full-CPU spread,
        # no actor ramp-up) whose closure carries only ObjectRefs; the
        # fqn->id dict is built once per worker process from the ray.put
        # index table (per-worker cache in stages.link).
        from ..stages.link import combined_linker_fn

        final_edges = all_nodes().map_batches(
            combined_linker_fn(index_ref, dyn_ref, member_ref), batch_format="pyarrow"
        )
    else:
        mapside_edges = all_nodes().map_batches(
            mapside_link_edges, batch_format="pyarrow"
        )
        final_edges = link_edges.union(mapside_edges)

    # AST edges from <speculatedMethods> to hint-only stubs (reference
    # `XTypeHintCallLinker.scala:166-183`) — a tiny map over the
    # aggregated survey written to its OWN edges root (edges_spec).
    # NEVER union this into the main edge stream: a Dataset.union —
    # even with an empty side — breaks streaming fusion of the link
    # scan (measured 74s -> 137s materialize at 8 CPUs).
    def _spec_ast(b: pa.Table) -> pa.Table:
        import ray as _ray

        keep = pc.and_(
            pc.and_(
                pc.greater(b.column("th_c"), 0), pc.equal(b.column("m_c"), 0)
            ),
            pc.equal(b.column("ca_c"), 0),
        )
        dk = _KEYSET_CACHE.get(dyn_keys_ref.hex())
        if dk is None:
            dk = _ray.get(dyn_keys_ref)
            _KEYSET_CACHE[dyn_keys_ref.hex()] = dk
        if len(dk):
            keep = pc.and_(
                keep,
                pc.invert(
                    pc.is_in(b.column("skey").cast(pa.string()), value_set=dk)
                ),
            )
        s = b.filter(keep)
        fqns = [k for k in s.column("skey").to_pylist() if k]
        parts = []
        if fqns:
            ns_id = namespace_id("<speculatedMethods>")
            parts.append(
                pa.table(
                    {
                        "subj": pa.array([ns_id] * len(fqns), pa.uint64()),
                        "pred": pa.array(["AST"] * len(fqns), pa.string()),
                        "obj": pa.array([stub_id(f) for f in sorted(fqns)], pa.uint64()),
                        "variable": pa.nulls(len(fqns), pa.string()),
                    },
                    schema=EDGES_SCHEMA,
                )
            )
        # TypeRefPass REF edges for TYPE_DECL stubs (TypeDeclStubCreator):
        # TYPE dim -> external TYPE_DECL, same convention as declared types
        tds_ = b.filter(
            pc.and_(pc.greater(b.column("ty_c"), 0), pc.equal(b.column("td_c"), 0))
        )
        td_fqns = sorted(k for k in tds_.column("skey").to_pylist() if k)
        if td_fqns:
            parts.append(
                pa.table(
                    {
                        "subj": pa.array([type_id(f) for f in td_fqns], pa.uint64()),
                        "pred": pa.array(["REF"] * len(td_fqns), pa.string()),
                        "obj": pa.array(
                            [typedecl_stub_id(f) for f in td_fqns], pa.uint64()
                        ),
                        "variable": pa.nulls(len(td_fqns), pa.string()),
                    },
                    schema=EDGES_SCHEMA,
                )
            )
        if not parts:
            return EDGES_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    # edges write + MinHash equivalence run concurrently (independent)
    import threading

    # settle a lazy-import RACE before the concurrent writes: Ray's path
    # resolution probes `fsspec.implementations.http` on every dataset
    # construction; the container has no aiohttp, so the import always
    # fails and is retried — two driver threads importing it
    # concurrently can observe a partially-initialized module ("cannot
    # import name HTTPFileSystem") and crash.  Register a stub module
    # once so the probe import succeeds; Ray only touches the name after
    # an isinstance(PyFileSystem) gate that local paths never pass.
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:  # noqa: BLE001
        import types as _types

        _stub = _types.ModuleType("fsspec.implementations.http")
        _stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = _stub

    errs: list[BaseException] = []

    def _w(ds_, path_, name_):
        try:
            _tw = time.perf_counter()
            # partitioned write (hash by subj, per-partition manifests).
            # A streaming write_parquet (no materialize/shuffle) was
            # measured as the alternative at 600k docs: faster at 8 CPUs
            # (470s vs 534s total) but slower at 32 (240s vs 225s — one
            # small file per block beats the coalescing shuffle only
            # when CPUs are scarce); the partitioned layout also keeps
            # partition-level resume, so it stays the default.
            partitioned_write(ds_, path_, name_, parse_fp, num_partitions)
            if _prof:
                print(
                    f"[build_cpg] thread:{name_}: {time.perf_counter() - _tw:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    # dims runs SEQUENTIALLY before the two overlapped writes: a third
    # concurrent streaming executor livelocks at low CPU counts (all
    # three block in get_output_blocking while the raylet thrashes
    # workers — observed at 4 CPUs); the dims execution is small (one
    # groupby over distinct FQNs), so serializing costs little.
    _build_dims()
    _mark("dims")
    t2 = threading.Thread(target=_w, args=(final_edges, edges_path, "edges"))
    t2.start()

    # ---- stage: entity equivalence (MinHash collapse; north star:
    # "min-hash dedup collapses equivalent entities") -------------------
    # Near-identical METHOD bodies across documents map to one canonical
    # entity id (provenance preserved — members keep their own rows; the
    # equivalences table is the collapse mapping).  Distributed
    # (MinHasher actor pool + band groupby) and overlapped with the two
    # partitioned writes.
    equiv_path = os.path.join(out_dir, "equivalences")
    eq_box: list = [None]

    def _equiv():
        try:
            _te = time.perf_counter()
            from ..stages.dedup import minhash_dedup

            def methods_code(batch: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.equal(batch.column("label"), "METHOD"),
                    pc.not_equal(pc.coalesce(batch.column("code"), pa.scalar("")), ""),
                )
                b = batch.filter(m)
                return pa.table(
                    {
                        # ids are 63-bit — safe in the int64 the dedup
                        # stage uses
                        "method_id": b.column("id").combine_chunks().cast(pa.int64()),
                        "text": pc.coalesce(b.column("code"), pa.scalar("")),
                    }
                )

            # task-based minhash (per-worker memo) — no pinned actor
            # CPUs, so this overlaps the edge write without starving it
            out = minhash_dedup(
                mt_ds().map_batches(methods_code, batch_format="pyarrow"),
                text_col="text",
                id_col="method_id",
                num_perm=64,
                bands=16,
            )

            # keep only actually-collapsed members (canonical != self);
            # the collapse mapping is written DISTRIBUTED (sorted for
            # determinism) — at web scale it is O(duplicated methods)
            # and must never pass through the driver
            def collapsed_only(batch: pa.Table) -> pa.Table:
                b = batch.filter(
                    pc.not_equal(
                        batch.column("method_id"), batch.column("canonical_id")
                    )
                )
                return b.rename_columns(["method_id", "entity_id"])

            import shutil as _shutil

            if os.path.isdir(equiv_path):
                _shutil.rmtree(equiv_path)
            (
                # materialize first: Ray's sort samples boundaries in an
                # extra pass that would re-execute the minhash lineage
                out.map_batches(collapsed_only, batch_format="pyarrow")
                .materialize()
                .sort("method_id")
                .write_parquet(equiv_path)
            )
            os.makedirs(equiv_path, exist_ok=True)  # empty result edge case
            m = write_manifest(equiv_path, "equivalences", parse_fp, 0.0)
            eq_box[0] = m["rows"]
            if _prof:
                print(
                    f"[build_cpg] thread:equiv: {time.perf_counter() - _te:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t3 = threading.Thread(target=_equiv)
    t3.start()
    t2.join()
    t3.join()
    _mark("writes")
    if errs:
        raise errs[0]
    # stub count for stats/metrics: footer-filtered count off the dims
    # parquet (label is a dictionary-encodable column; no key set needed)
    try:
        n_stubs = (
            pads.dataset(dims_path, format="parquet")
            .count_rows(filter=pads.field("label") == "METHOD")
        )
    except Exception:  # noqa: BLE001
        n_stubs = 0
    # persist the stats a resumed run must reproduce (same return contract)
    _stats = {
        "equivalences_path": equiv_path if eq_box[0] is not None else None,
        "n_collapsed_methods": eq_box[0] or 0,
        "link_regime": link_regime,
        "n_methods": n_methods,
        "n_stubs": n_stubs,
        "n_hot_keys": len(hot_keys),
        "n_dyn_fqns": len(dyn_fqn),
        "dyn_regime": dyn_regime,
    }
    with open(os.path.join(out_dir, "build_stats.json"), "w") as f:
        _json.dump(_stats, f, indent=1)
    # dims manifest last: its presence marks the whole chain complete
    write_manifest(dims_path, "dims", parse_fp, 0.0)
    return {
        "equivalences_path": equiv_path if eq_box[0] is not None else None,
        "n_collapsed_methods": eq_box[0] or 0,
        "out_dir": out_dir,
        "nodes_path": nodes_paths(out_dir),
        "edges_path": edges_paths(out_dir),
        "edges_linked_path": edges_path,
        "dims_path": os.path.join(dims_path, "rk=node"),
        "parse_path": parse_path,
        "link_regime": link_regime,
        "n_methods": n_methods,
        "n_stubs": n_stubs,
        "n_hot_keys": len(hot_keys),
        "n_dyn_fqns": len(dyn_fqn),
        "dyn_regime": dyn_regime,
        "resumed": False,
    }
