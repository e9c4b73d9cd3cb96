"""CLI entry points — the `joern-parse` / `joern-scan` / `joern-export`
surface (reference `joern-cli/.../JoernParse.scala:81-92`,
`JoernScan.scala:46-120`, `JoernExport.scala:35-126`) over Ray Data.

Usage:
  python -m joern_ray.cli parse --input DOCS.parquet_dir --out OUT
  python -m joern_ray.cli parse --synthetic 3000 --out OUT
  python -m joern_ray.cli scan  --cpg OUT [--sarif FINDINGS.sarif]
  python -m joern_ray.cli export --cpg OUT --format neo4jcsv|graphml --out DIR
  python -m joern_ray.cli query --cpg OUT --starter method --name REGEX

The CLI owns its Ray session (guarded init — the driver contract
forbids init inside library code, `__ray_entry__.py`)."""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_parse(args) -> int:
    import ray.data

    from .pipelines.cpg import build_cpg
    from .sources.corpus import docs_dataset

    _ray_init(args.num_cpus)
    if args.synthetic:
        fp = f"synthetic-{args.synthetic}"

        def docs_factory(columns):
            return docs_dataset(args.synthetic, parallelism=max(4, args.synthetic // 256))

    else:
        fp = f"input-{args.input}"

        def docs_factory(columns):
            return ray.data.read_parquet(args.input, columns=columns)

    res = build_cpg(docs_factory, args.out, fp)
    print(json.dumps({k: v for k, v in res.items() if not callable(v)}))
    return 0


DANGEROUS_DEFAULT = "gets,strcpy,strcat,sprintf,system,popen,scanf"


def cmd_scan(args) -> int:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    _ray_init(args.num_cpus)
    from .pipelines.cpg import nodes_paths

    names = args.names.split(",")
    # nodes are MULTI-ROOT (parse nodes + canonical mt + dims — never
    # rewritten); nodes_paths expands every root's parquet files
    nodes = ray.data.read_parquet(
        nodes_paths(args.cpg), columns=["id", "label", "name", "code", "url", "line"]
    )

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch.column("label"), "CALL"),
            pc.is_in(batch.column("name"), value_set=pa.array(names)),
        )
        return batch.filter(m)

    hits = nodes.map_batches(f, batch_format="pyarrow")
    parts = list(hits.iter_batches(batch_format="pyarrow", batch_size=None))
    t = pa.concat_tables(parts) if parts else None
    n = t.num_rows if t is not None else 0
    print(json.dumps({"findings": n}))
    if t is not None and n and args.sarif:
        from .io.export import export_sarif

        findings = pa.table(
            {
                "name": t.column("name"),
                "url": t.column("url"),
                "line": t.column("line"),
                "message": pa.array(
                    [f"call to dangerous function: {c}" for c in t.column("code").to_pylist()],
                    pa.string(),
                ),
            }
        )
        export_sarif(findings, args.sarif)
        print(f"sarif: {args.sarif}", file=sys.stderr)
    return 0


def cmd_export(args) -> int:
    import pyarrow as pa
    import ray.data

    _ray_init(args.num_cpus)
    from .pipelines.cpg import nodes_paths, read_edges

    nodes = ray.data.read_parquet(nodes_paths(args.cpg))
    edges = read_edges(args.cpg)
    if args.format == "neo4jcsv":
        from .io.export import export_neo4j_csv

        res = export_neo4j_csv(nodes, edges, args.out)
        print(json.dumps(res))
    elif args.format == "graphml":
        from .io.export import export_graphml
        from .pipelines.cpg import nodes_paths as _np
        from .schemas import NODES_SCHEMA

        # fixed projection: the roots carry differing extra columns
        # (same normalization as the query DSL's nodes_ds)
        nodes = ray.data.read_parquet(
            _np(args.cpg),
            columns=[
                n for n in NODES_SCHEMA.names if n != "dynamic_type_hint_full_name"
            ],
        )
        nt = pa.concat_tables(list(nodes.iter_batches(batch_format="pyarrow", batch_size=None)))
        et = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow", batch_size=None)))
        print(export_graphml(nt, et, args.out))
    else:
        print(f"unknown format {args.format}", file=sys.stderr)
        return 2
    return 0


def cmd_query(args) -> int:
    from .query.dsl import Cpg

    _ray_init(args.num_cpus)
    from .pipelines.cpg import edges_paths, nodes_paths

    cpg = Cpg(nodes_paths(args.cpg), edges_paths(args.cpg))
    steps = getattr(cpg, args.starter)(args.name) if args.name else getattr(cpg, args.starter)()
    if args.call_in:
        steps = steps.call_in()
    t = steps.l(["label", "name", "code", "url", "line"])
    for row in t.to_pylist()[: args.limit]:
        print(json.dumps(row))
    return 0


def cmd_console(args) -> int:
    """Interactive console / scripted eval (reference joern REPL,
    `console/.../Console.scala` + `joern --script`): binds `cpg` (the
    query-DSL root over the CPG at --cpg) plus pa/pc, then either
    evaluates --eval expressions and prints their results, or drops
    into an interactive Python REPL."""
    import code

    import pyarrow as pa
    import pyarrow.compute as pc

    from .pipelines.cpg import edges_paths, nodes_paths
    from .query.dsl import Cpg

    _ray_init(args.num_cpus)
    cpg = Cpg(nodes_paths(args.cpg), edges_paths(args.cpg))
    ns = {"cpg": cpg, "pa": pa, "pc": pc}
    if args.eval:
        for expr in args.eval:
            out = eval(expr, ns)  # noqa: S307 — the user's own script line
            if isinstance(out, pa.Table):
                for row in out.to_pylist()[: args.limit]:
                    print(json.dumps(row, default=str))
            elif out is not None:
                print(out)
        return 0
    code.interact(
        banner="joern_ray console — `cpg` is bound (e.g. cpg.method('^main').l())",
        local=ns,
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    p = argparse.ArgumentParser(prog="joern_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("parse", parents=[common])
    pp.add_argument("--input", help="parquet dir/file of (url,warc_ts,html,text,lang) docs")
    pp.add_argument("--synthetic", type=int, help="generate N synthetic docs instead")
    pp.add_argument("--out", required=True)
    pp.set_defaults(fn=cmd_parse)

    ps = sub.add_parser("scan", parents=[common])
    ps.add_argument("--cpg", required=True)
    ps.add_argument("--names", default=DANGEROUS_DEFAULT)
    ps.add_argument("--sarif")
    ps.set_defaults(fn=cmd_scan)

    pe = sub.add_parser("export", parents=[common])
    pe.add_argument("--cpg", required=True)
    pe.add_argument("--format", default="neo4jcsv")
    pe.add_argument("--out", required=True)
    pe.set_defaults(fn=cmd_export)

    pq = sub.add_parser("query", parents=[common])
    pq.add_argument("--cpg", required=True)
    pq.add_argument("--starter", default="method")
    pq.add_argument("--name")
    pq.add_argument("--call-in", action="store_true")
    pq.add_argument("--limit", type=int, default=20)
    pq.set_defaults(fn=cmd_query)

    pc_ = sub.add_parser("console", parents=[common])
    pc_.add_argument("--cpg", required=True)
    pc_.add_argument(
        "--eval", action="append",
        help="expression over `cpg` to evaluate (repeatable); omit for a REPL",
    )
    pc_.add_argument("--limit", type=int, default=20)
    pc_.set_defaults(fn=cmd_console)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
