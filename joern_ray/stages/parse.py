"""Fragment-parse stage: fragments batch -> nodes + edges (+ rejects).

The analogue of the reference's `AstCreationPass` (one parser instance per
pass shared by all parallel parts, `c2cpg/.../AstCreationPass.scala:92-93`)
plus ALL per-method overlay passes (CFG / dominators / CDG / reaching-def /
CONTAINS — reference runs them as separate `ForkJoinParallelCpgPass`es per
method; here they are fused into the parse UDF because each fragment's
methods are already in memory — zero extra shuffles, SURVEY.md §4.2).

Ray Data has single-output operators, so the stage emits ONE tagged-union
Arrow table carrying node rows, edge rows and reject rows discriminated by
`row_kind`; cheap downstream filters split the streams (same pattern as
`detect_fragments_batch`).

Stateful-actor design: `ParseFragments` is a callable CLASS for
`map_batches(ParseFragments, concurrency=N)` — parser construction and the
parse-tree cache live in `__init__` (once per actor), per-batch work in
`__call__`.  The cache keys on `(content_hash, dialect)`: web corpora are
full of byte-identical boilerplate snippets (FIXTURES.md: 5 % shared
blocks), and re-flattening a cached tree under a new (url, fragment_idx)
is ~10x cheaper than re-parsing.
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa

from ..graph.cfg import method_overlays
from ..parsing.astmodel import PNode, flatten
from ..parsing.parser import FragmentParser, ParseError
from ..schemas import EDGES_SCHEMA, NODES_SCHEMA, REJECTS_SCHEMA, rows_to_table

# Union layout: nodes cols ∪ edges cols ∪ reject cols + row_kind.
UNION_SCHEMA = pa.schema(
    [
        *NODES_SCHEMA,
        *[f for f in EDGES_SCHEMA],
        pa.field("stage", pa.string()),
        pa.field("reason", pa.string()),
        pa.field("row_kind", pa.string()),
    ]
)


def make_union_table(
    node_rows: list[dict], edge_rows: list[dict], reject_rows: list[dict]
) -> pa.Table:
    nt = rows_to_table(node_rows, NODES_SCHEMA)
    et = rows_to_table(edge_rows, EDGES_SCHEMA)
    rt = rows_to_table(reject_rows, REJECTS_SCHEMA)
    n_n, n_e, n_r = nt.num_rows, et.num_rows, rt.num_rows
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in NODES_SCHEMA.names:
        typ = NODES_SCHEMA.field(name).type
        pieces = [nt.column(name).combine_chunks()]
        if name == "url":  # rejects carry url too
            pieces += [pa.nulls(n_e, typ), rt.column("url").combine_chunks()]
        elif name == "fragment_idx":
            pieces += [pa.nulls(n_e, typ), rt.column("fragment_idx").combine_chunks()]
        else:
            pieces.append(pa.nulls(n_e + n_r, typ))
        cols[name] = pa.concat_arrays(pieces)
    for name in EDGES_SCHEMA.names:
        typ = EDGES_SCHEMA.field(name).type
        cols[name] = pa.concat_arrays(
            [pa.nulls(n_n, typ), et.column(name).combine_chunks(), pa.nulls(n_r, typ)]
        )
    for name in ("stage", "reason"):
        typ = REJECTS_SCHEMA.field(name).type
        cols[name] = pa.concat_arrays(
            [pa.nulls(n_n + n_e, typ), rt.column(name).combine_chunks()]
        )
    cols["row_kind"] = pa.array(
        ["node"] * n_n + ["edge"] * n_e + ["reject"] * n_r, pa.string()
    )
    return pa.table(cols, schema=UNION_SCHEMA)


def split_union(ds, kind: str):
    """Dataset of union rows -> dataset of one kind with its own columns."""
    keep = {
        "node": list(NODES_SCHEMA.names),
        "edge": list(EDGES_SCHEMA.names),
        "reject": list(REJECTS_SCHEMA.names),
    }[kind]

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(batch.column("row_kind"), kind)
        return batch.filter(mask).select(keep)

    return ds.map_batches(_filter, batch_format="pyarrow")


class ParseFragments:
    """Actor-pool stage: FRAGMENTS_SCHEMA batches -> UNION_SCHEMA batches."""

    def __init__(self, cache_size: int = 4096, with_overlays: bool = True) -> None:
        self.parsers = {
            d: FragmentParser(d) for d in ("c", "cpp", "java", "javascript")
        }
        self.cache: OrderedDict[tuple[int, str], tuple[PNode, list]] = OrderedDict()
        self.cache_size = cache_size
        self.with_overlays = with_overlays
        self.hits = 0
        self.misses = 0

    def _parse_one(
        self, code: str, dialect: str, content_hash: int, url: str, idx: int
    ) -> tuple[PNode, list] | None:
        key = (content_hash, dialect)
        cached = self.cache.get(key)
        if cached is not None:
            self.cache.move_to_end(key)
            self.hits += 1
            return cached
        self.misses += 1
        parser = self.parsers[dialect]
        try:
            root = parser.parse(code, url, idx)
        except ParseError:
            return None
        except RecursionError:
            return None
        overlays = method_overlays(root) if self.with_overlays else []
        self.cache[key] = (root, overlays)
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return root, overlays

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Accept detect_fragments' tagged union directly: upstream reject
        # rows pass through unchanged; `doc` rows become FILE nodes (one
        # per url — FileCreationPass analog with zero extra passes);
        # fragment rows get parsed.
        passthrough_rejects: list[dict] = []
        file_rows: list[dict] = []
        if "row_kind" in batch.column_names:
            import pyarrow.compute as pc

            from ..stages.link import file_id

            rej = batch.filter(pc.equal(batch.column("row_kind"), "reject"))
            passthrough_rejects = [
                {
                    "url": u,
                    "fragment_idx": i,
                    "stage": s,
                    "reason": r,
                }
                for u, i, s, r in zip(
                    rej.column("url").to_pylist(),
                    rej.column("fragment_idx").to_pylist(),
                    rej.column("stage").to_pylist(),
                    rej.column("reason").to_pylist(),
                )
            ]
            docs = batch.filter(pc.equal(batch.column("row_kind"), "doc"))
            file_rows = [
                {
                    "id": file_id(u),
                    "label": "FILE",
                    "name": u,
                    "full_name": u,
                    "url": u,
                    "order": 0,
                    "argument_index": -1,
                    "line": -1,
                    "col": -1,
                }
                for u in docs.column("url").to_pylist()
            ]
            batch = batch.filter(pc.equal(batch.column("row_kind"), "fragment"))
        urls = batch.column("url").to_pylist()
        idxs = batch.column("fragment_idx").to_pylist()
        langs = batch.column("frag_lang").to_pylist()
        codes = batch.column("code").to_pylist()
        hashes = batch.column("content_hash").to_pylist()
        node_rows: list[dict] = file_rows
        edge_rows: list[dict] = []
        reject_rows: list[dict] = passthrough_rejects
        for url, idx, lang, code, chash in zip(urls, idxs, langs, codes, hashes):
            if lang not in self.parsers:
                reject_rows.append(
                    {
                        "url": url,
                        "fragment_idx": idx,
                        "stage": "parse",
                        "reason": f"unsupported_language:{lang}",
                    }
                )
                continue
            parsed = self._parse_one(code, lang, chash, url, idx)
            if parsed is None:
                reject_rows.append(
                    {
                        "url": url,
                        "fragment_idx": idx,
                        "stage": "parse",
                        "reason": "parse_failure",
                    }
                )
                continue
            root, overlays = parsed
            nrows, erows = flatten(root, url, idx, lang)
            node_rows.extend(nrows)
            edge_rows.extend(erows)
            # overlay edges reference PNodes whose ids flatten() just set
            for a, pred, b, var in overlays:
                edge_rows.append(
                    {"subj": a.id, "pred": pred, "obj": b.id, "variable": var}
                )
        return make_union_table(node_rows, edge_rows, reject_rows)
