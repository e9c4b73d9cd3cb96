"""Scanner query bundle — the querydb analog.

The reference ships 41 vulnerability-query files under
`querydb/src/main/scala/io/joern/scanners/` (e.g.
`c/DangerousFunctions.scala:13-52` — `cpg.method("(?i)gets").callIn`;
`c/CopyLoops.scala`, `c/FormatStrings`, …), each a `Query` record with
name/author/title/score/traversal discovered by `QueryDatabase`
(`macros/.../QueryDatabase.scala:12`) and run serially by `ScanPass`
(`console/.../scan/ScanPass.scala:8-16`) into FINDING nodes.

Here a query = (metadata, function Cpg -> findings Table).  `run_scan`
executes a bundle serially (same contract as ScanPass: queries are
internally parallel — each traversal is a distributed Ray pipeline —
so no outer parallelism) and returns a findings table exportable to
SARIF via `io.export.export_sarif`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .dsl import Cpg

FINDING_COLS = ["name", "url", "line", "message"]


@dataclass(frozen=True)
class Query:
    """Reference `macros/.../Query.scala:10-22`: name/title/description/
    score + traversal."""

    name: str
    title: str
    score: float
    traversal: Callable[[Cpg], pa.Table]
    tags: tuple = ()


def _findings(t: pa.Table, qname: str, message: str) -> pa.Table:
    return pa.table(
        {
            "name": pa.array([qname] * t.num_rows, pa.string()),
            "url": t.column("url").cast(pa.string()),
            "line": t.column("line").cast(pa.int32()),
            "message": pa.array(
                [f"{message}: {c}" for c in t.column("code").to_pylist()], pa.string()
            ),
        }
    )


def _calls_to(cpg: Cpg, regex: str) -> pa.Table:
    return cpg.method(regex).call_in().l(["url", "line", "code"])


# ---- the bundle (C-flavored, mirroring querydb/c) -------------------------


def q_gets(cpg: Cpg) -> pa.Table:
    """`DangerousFunctions.scala:13-24` — gets() is never safe."""
    return _findings(_calls_to(cpg, "^gets$"), "call-to-gets", "unsafe gets")


def q_strcpy(cpg: Cpg) -> pa.Table:
    return _findings(
        _calls_to(cpg, "^(strcpy|strcat|sprintf)$"),
        "unbounded-string-copy",
        "unbounded copy",
    )


def q_scanf(cpg: Cpg) -> pa.Table:
    return _findings(_calls_to(cpg, "^scanf$"), "uncontrolled-scanf", "scanf without width")


def q_system(cpg: Cpg) -> pa.Table:
    return _findings(
        _calls_to(cpg, "^(system|popen|exec[lv]p?e?)$"),
        "shell-injection-sink",
        "command execution",
    )


def q_format_string(cpg: Cpg) -> pa.Table:
    """printf with a non-literal first argument (format-string shape)."""
    calls = cpg.call("^printf$")
    args = calls.argument().l(["id", "label", "url", "line", "code"])
    nonlit = args.filter(pc.invert(pc.equal(args.column("label"), "LITERAL")))
    return _findings(nonlit, "format-string", "non-literal printf argument")


def q_malloc_no_check(cpg: Cpg) -> pa.Table:
    """malloc assignments (candidates for missing NULL checks —
    `NullTermination`-style shape)."""
    t = cpg.call().code(".*= malloc\\(.*").l(["url", "line", "code"])
    return _findings(t, "malloc-unchecked", "allocation (verify NULL check)")


def q_free_use(cpg: Cpg) -> pa.Table:
    """use-after-free via dataflow: uses reached by defs that flow into
    free() arguments (F3 shape, bounded depth)."""
    frees = cpg.call("^free$")
    args = frees.argument()
    reached = args.reachable_by(cpg.call().code(".*malloc\\(.*"))
    t = reached.l(["url", "line", "code"])
    return _findings(t, "use-after-free-candidate", "freed allocation flows here")


def q_large_stack_buffer(cpg: Cpg) -> pa.Table:
    """LOCALs with large array types (`c/StackBuffers` shape)."""
    locs = cpg.local().l(["url", "line", "code", "type_full_name"])
    big = []
    for i, tfn in enumerate(locs.column("type_full_name").to_pylist()):
        if tfn and "[" in tfn:
            try:
                size = int("".join(ch for ch in tfn.split("[")[1] if ch.isdigit()) or 0)
            except ValueError:
                size = 0
            if size >= 128:
                big.append(i)
    t = locs.take(big) if big else locs.slice(0, 0)
    return _findings(t, "large-stack-buffer", "large stack buffer")


BUNDLE: tuple[Query, ...] = (
    Query("call-to-gets", "Dangerous function gets()", 8.0, q_gets, ("c", "cwe-242")),
    Query("unbounded-string-copy", "strcpy/strcat/sprintf", 7.0, q_strcpy, ("c", "cwe-120")),
    Query("uncontrolled-scanf", "scanf without width", 5.0, q_scanf, ("c",)),
    Query("shell-injection-sink", "system()/popen()", 8.0, q_system, ("c", "cwe-78")),
    Query("format-string", "non-literal format", 6.0, q_format_string, ("c", "cwe-134")),
    Query("malloc-unchecked", "unchecked malloc", 3.0, q_malloc_no_check, ("c",)),
    Query("use-after-free-candidate", "UAF candidate", 9.0, q_free_use, ("c", "cwe-416")),
    Query("large-stack-buffer", "large stack buffer", 4.0, q_large_stack_buffer, ("c",)),
)


def run_scan(
    cpg: Cpg, names: tuple = (), tags: tuple = ()
) -> pa.Table:
    """ScanPass analog: run each selected query serially (each traversal
    is internally a parallel Ray pipeline), concatenate findings."""
    out: list[pa.Table] = []
    for q in BUNDLE:
        if names and q.name not in names:
            continue
        if tags and not (set(tags) & set(q.tags)):
            continue
        try:
            out.append(q.traversal(cpg))
        except Exception:  # noqa: BLE001 — reference swallows query errors
            # (`scan/package.scala:32-36`) and continues the scan
            continue
    if not out:
        return pa.table(
            {
                "name": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "line": pa.array([], pa.int32()),
                "message": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(out)
