"""Exporters: per-method DOT, Neo4j-CSV, GraphML, SARIF findings.

Re-expresses `JoernExport` (`joern-cli/.../JoernExport.scala:35-126` —
representations AST/CFG/DDG/CDG per method, formats Dot / Neo4j-CSV /
GraphML / GraphSON) and the SARIF writer (`semanticcpg/.../sarif/`).

Per-method DOT renders during a parse pass (actor pool, zero joins —
each fragment's methods are in memory exactly when needed, the same
fusion argument as the overlay passes); whole-graph CSV/GraphML render
from the materialized node/edge Parquet.
"""

from __future__ import annotations

from ..util import resolve_pool

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..parsing.astmodel import PNode
from ..parsing.parser import FragmentParser, ParseError


def _dot_escape(s: str) -> str:
    return (s or "").replace("\\", "\\\\").replace('"', '\\"')[:60]


def method_ast_dot(method: PNode) -> str:
    """One METHOD subtree -> DOT digraph (reference `DotAstGenerator`)."""
    lines = [f'digraph "{_dot_escape(method.name)}" {{']
    counter = [0]

    def walk(n: PNode) -> int:
        my = counter[0]
        counter[0] += 1
        label = f"{n.label}, {n.code or n.name}" if (n.code or n.name) else n.label
        lines.append(f'  n{my} [label="{_dot_escape(label)}"]')
        for c in n.children:
            cid = walk(c)
            lines.append(f"  n{my} -> n{cid}")
        return my

    walk(method)
    lines.append("}")
    return "\n".join(lines)


def method_overlay_dot(method: PNode, preds: tuple[str, ...], title: str) -> str:
    """One METHOD subtree -> DOT of its CFG/DDG/CDG overlay edges
    (reference `DotCfgGenerator`/`DdgNodeDot`)."""
    from ..graph.cfg import method_overlays

    wanted = [
        (a, p, b, v)
        for a, p, b, v in method_overlays(method)
        if p in preds
    ]
    ids: dict[int, int] = {}
    lines = [f'digraph "{_dot_escape(method.name)}-{title}" {{']
    def nid(n: PNode) -> int:
        if id(n) not in ids:
            ids[id(n)] = len(ids)
            label = f"{n.label}, {n.code or n.name}"
            lines.append(f'  n{ids[id(n)]} [label="{_dot_escape(label)}"]')
        return ids[id(n)]
    for a, p, b, v in wanted:
        ia, ib = nid(a), nid(b)
        attr = f' [label="{_dot_escape(v)}"]' if v else ""
        lines.append(f"  n{ia} -> n{ib}{attr}")
    lines.append("}")
    return "\n".join(lines)


_REPR_PREDS = {
    "cfg": ("CFG",),
    "ddg": ("REACHING_DEF",),
    "cdg": ("CDG",),
    "pdg": ("REACHING_DEF", "CDG"),
}


class DotExporter:
    """Actor-pool stage: fragment batches -> (url, fragment_idx,
    method_full_name, dot) rows.  `repr_` picks the subgraph
    (reference `JoernExport` representations: ast|cfg|ddg|cdg|pdg)."""

    def __init__(self, repr_: str = "ast") -> None:
        from ..parsing.gofrontend import GoFragmentParser
        from ..parsing.pyfrontend import PyFragmentParser

        self.parsers = {d: FragmentParser(d) for d in ("c", "cpp", "java", "javascript")}
        self.parsers["python"] = PyFragmentParser()
        self.parsers["go"] = GoFragmentParser()
        self.repr = repr_

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "row_kind" in batch.column_names:
            batch = batch.filter(pc.equal(batch.column("row_kind"), "fragment"))
        urls, idxs, langs, codes = (
            batch.column("url").to_pylist(),
            batch.column("fragment_idx").to_pylist(),
            batch.column("frag_lang").to_pylist(),
            batch.column("code").to_pylist(),
        )
        o_url, o_idx, o_fqn, o_dot = [], [], [], []
        for url, idx, lang, code in zip(urls, idxs, langs, codes):
            parser = self.parsers.get(lang)
            if parser is None:
                continue
            try:
                root = parser.parse(code, url, idx)
            except (ParseError, RecursionError):
                continue

            def methods(n: PNode):
                if n.label == "METHOD":
                    yield n
                for c in n.children:
                    yield from methods(c)

            for m in methods(root):
                o_url.append(url)
                o_idx.append(idx)
                o_fqn.append(m.full_name)
                if self.repr == "ast":
                    o_dot.append(method_ast_dot(m))
                else:
                    o_dot.append(
                        method_overlay_dot(m, _REPR_PREDS[self.repr], self.repr)
                    )
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "fragment_idx": pa.array(o_idx, pa.int32()),
                "method_full_name": pa.array(o_fqn, pa.string()),
                "dot": pa.array(o_dot, pa.string()),
            }
        )


def export_dot(docs_ds, repr_: str = "ast", concurrency=None):
    """docs -> detected fragments -> per-method dot rows (streams)."""
    from ..stages.extract import detect_fragments_batch

    return docs_ds.map_batches(
        detect_fragments_batch, batch_format="pyarrow"
    ).map_batches(
        DotExporter,
        fn_constructor_kwargs={"repr_": repr_},
        batch_format="pyarrow",
        concurrency=resolve_pool(concurrency),
    )


# ---------------------------------------------------------------------------
# Neo4j CSV (bulk-import layout: nodes with :ID/:LABEL, edges with
# :START_ID/:END_ID/:TYPE — reference JoernExport format Neo4jCsv)
# ---------------------------------------------------------------------------


def export_neo4j_csv(nodes_ds, edges_ds, out_dir: str) -> dict:
    import os

    os.makedirs(out_dir, exist_ok=True)

    def node_csv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                ":ID": batch.column("id"),
                ":LABEL": batch.column("label"),
                "name": batch.column("name"),
                "full_name": batch.column("full_name"),
                "code": batch.column("code"),
                "url": batch.column("url"),
                "line": batch.column("line"),
            }
        )

    def edge_csv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                ":START_ID": batch.column("subj"),
                ":END_ID": batch.column("obj"),
                ":TYPE": batch.column("pred"),
                "variable": batch.column("variable"),
            }
        )

    nodes_ds.map_batches(node_csv, batch_format="pyarrow").write_csv(
        os.path.join(out_dir, "nodes")
    )
    edges_ds.map_batches(edge_csv, batch_format="pyarrow").write_csv(
        os.path.join(out_dir, "edges")
    )
    return {"nodes": os.path.join(out_dir, "nodes"), "edges": os.path.join(out_dir, "edges")}


def export_graphml(nodes: pa.Table, edges: pa.Table, path: str) -> str:
    """Whole-graph GraphML (driver-side; use on filtered subgraphs)."""
    from xml.sax.saxutils import escape

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        f.write('<key id="label" for="node" attr.name="label" attr.type="string"/>\n')
        f.write('<key id="code" for="node" attr.name="code" attr.type="string"/>\n')
        f.write('<key id="pred" for="edge" attr.name="pred" attr.type="string"/>\n')
        f.write('<graph id="cpg" edgedefault="directed">\n')
        for nid, lab, code in zip(
            nodes.column("id").to_pylist(),
            nodes.column("label").to_pylist(),
            nodes.column("code").to_pylist(),
        ):
            f.write(
                f'<node id="n{nid}"><data key="label">{escape(lab or "")}</data>'
                f'<data key="code">{escape((code or "")[:80])}</data></node>\n'
            )
        for i, (s, p, o) in enumerate(
            zip(
                edges.column("subj").to_pylist(),
                edges.column("pred").to_pylist(),
                edges.column("obj").to_pylist(),
            )
        ):
            f.write(
                f'<edge id="e{i}" source="n{s}" target="n{o}">'
                f'<data key="pred">{escape(p)}</data></edge>\n'
            )
        f.write("</graph>\n</graphml>\n")
    return path


def export_sarif(findings: pa.Table, path: str, tool_name: str = "joern-ray-scan") -> str:
    """Findings table (name, url, line, message) -> SARIF 2.1.0."""
    results = []
    for name, url, line, msg in zip(
        findings.column("name").to_pylist(),
        findings.column("url").to_pylist(),
        findings.column("line").to_pylist(),
        findings.column("message").to_pylist()
        if "message" in findings.column_names
        else [None] * findings.num_rows,
    ):
        results.append(
            {
                "ruleId": name,
                "message": {"text": msg or f"dangerous call: {name}"},
                "locations": [
                    {
                        "physicalLocation": {
                            "artifactLocation": {"uri": url or ""},
                            "region": {"startLine": max(1, line or 1)},
                        }
                    }
                ],
            }
        )
    doc = {
        "$schema": "https://raw.githubusercontent.com/oasis-tcs/sarif-spec/master/Schemata/sarif-schema-2.1.0.json",
        "version": "2.1.0",
        "runs": [
            {
                "tool": {"driver": {"name": tool_name, "version": "0.1.0"}},
                "results": results,
            }
        ],
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return path


def export_graphson(nodes: pa.Table, edges: pa.Table, path: str) -> str:
    """Whole-graph GraphSON 3.0-ish (reference JoernExport format
    Graphson); driver-side — use on filtered subgraphs."""
    g = {"vertices": [], "edges": []}
    for nid, lab, name, code in zip(
        nodes.column("id").to_pylist(),
        nodes.column("label").to_pylist(),
        nodes.column("name").to_pylist(),
        nodes.column("code").to_pylist(),
    ):
        g["vertices"].append(
            {
                "id": {"@type": "g:Int64", "@value": nid},
                "label": lab,
                "properties": {
                    "name": name or "",
                    "code": (code or "")[:120],
                },
            }
        )
    for i, (s, p, o) in enumerate(
        zip(
            edges.column("subj").to_pylist(),
            edges.column("pred").to_pylist(),
            edges.column("obj").to_pylist(),
        )
    ):
        g["edges"].append(
            {
                "id": {"@type": "g:Int64", "@value": i},
                "label": p,
                "outV": {"@type": "g:Int64", "@value": s},
                "inV": {"@type": "g:Int64", "@value": o},
            }
        )
    with open(path, "w") as f:
        json.dump(g, f)
    return path
