"""FQN-keyed edge view for P/R comparison (FIXTURES.md §3).

Converts id-keyed edges to `(subj_fqn, pred, obj_fqn, variable)` rows by
resolving each endpoint to a stable, id-free key:
`label:name-or-full_name@line` — the same information the reference's
tests assert on (`CallTests.scala:25-36` asserts code/name/order/line of
endpoints, never raw ids).
"""

from __future__ import annotations

import pyarrow as pa


def node_key(label: str, name: str, full_name: str, code: str, line: int) -> str:
    base = full_name or name or (code or "")[:40]
    return f"{label}:{base}@{line}"


def edges_fqn_table(nodes: pa.Table, edges: pa.Table) -> pa.Table:
    """Driver-side (test-scale) resolution of edge endpoints to FQN keys.
    Endpoints missing from `nodes` (e.g. cross-partition) keep their id."""
    idx: dict[int, str] = {}
    for nid, lab, name, fqn, code, line in zip(
        nodes.column("id").to_pylist(),
        nodes.column("label").to_pylist(),
        nodes.column("name").to_pylist(),
        nodes.column("full_name").to_pylist(),
        nodes.column("code").to_pylist(),
        nodes.column("line").to_pylist(),
    ):
        idx[nid] = node_key(lab, name or "", fqn or "", code or "", line if line is not None else -1)
    subj = [idx.get(s, str(s)) for s in edges.column("subj").to_pylist()]
    obj = [idx.get(o, str(o)) for o in edges.column("obj").to_pylist()]
    return pa.table(
        {
            "subj_fqn": pa.array(subj, pa.string()),
            "pred": edges.column("pred"),
            "obj_fqn": pa.array(obj, pa.string()),
            "variable": edges.column("variable"),
        }
    )


def precision_recall(
    got: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not got and not expected:
        return 1.0, 1.0
    tp = len(got & expected)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 1.0
    return p, r
