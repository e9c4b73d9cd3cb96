"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

--scaling: runs the headline CPG build twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs plus efficiency = (thr_32 / thr_8) / 4 — the sandbox
evidence for the north rule's N vs 4N cluster criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_OUT = "/tmp/joern_ray_bench"


def _docs_count() -> int:
    if "JOERN_RAY_BENCH_DOCS" in os.environ:
        return int(os.environ["JOERN_RAY_BENCH_DOCS"])
    name = os.path.basename(os.path.normpath(SF_DIR))
    return {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 100000}.get(name, 100000)


def _corpus_path(n: int) -> str:
    """Pre-written deterministic corpus parquet (untimed setup, shared
    across bench runs and the scaling children — 'same input')."""
    import ray.data

    from joern_ray.sources.corpus import docs_dataset

    path = os.path.join(BENCH_OUT, f"corpus_{n}")
    marker = os.path.join(path, "_done_v9")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        docs_dataset(n, parallelism=max(8, n // 256)).write_parquet(path)
        open(marker, "w").write("ok")
        # flush writeback BEFORE the timed region starts: generating a
        # ~GB corpus leaves dirty pages whose background flush competes
        # with the build's reads — measured 60.9s vs 41.3s cpg_build at
        # sf0.1/32cpu for cold-vs-warm corpus dir (the three-round
        # BASELINE-vs-driver headline gap).  os.sync() in the UNTIMED
        # setup makes first-run and warm-run measurements comparable.
        os.sync()
    return path


def _warm_workers(num_cpus: int) -> None:
    """Pre-import the library in Ray worker processes so cold-start
    import cost (~1-2s/worker) doesn't pollute throughput measurements —
    a long-lived cluster amortizes this to zero."""
    import ray

    @ray.remote
    def _warm() -> int:
        import joern_ray.pipelines.cpg  # noqa: F401
        import joern_ray.stages.parse  # noqa: F401

        return 0

    ray.get([_warm.remote() for _ in range(num_cpus)])


def run_cpg_build(num_cpus: int) -> dict:
    """Cold CPG build (cache wiped) over Parquet input — the headline.
    Returns seconds and output row counts."""
    import ray.data

    from joern_ray.pipelines.cpg import build_cpg

    _warm_workers(num_cpus)

    n = _docs_count()
    corpus = _corpus_path(n)
    out = os.path.join(BENCH_OUT, f"cpg_{n}_{num_cpus}")
    shutil.rmtree(out, ignore_errors=True)
    # last untimed-setup flush: deleting a previous ~12GB output dir
    # queues journal/discard I/O that otherwise lands inside the timed
    # region (standalone synced run 181.9s vs 219.8s in a back-to-back
    # scaling pair at 600k docs / 32 CPUs)
    os.sync()

    def docs_factory(columns):
        return ray.data.read_parquet(corpus, columns=columns)

    t0 = time.perf_counter()
    res = build_cpg(
        docs_factory,
        out,
        f"bench-{n}-v5",
        num_partitions=32,
        force_shuffle_link=bool(os.environ.get("JOERN_RAY_FORCE_SHUFFLE")),
    )
    wall = time.perf_counter() - t0
    from joern_ray.io.checkpoint import _footer_row_count

    linked_manifest = json.load(
        open(os.path.join(res["edges_linked_path"], "_manifest.json"))
    )
    # nodes are multi-root (parse nodes + canonical mt + dims — never
    # rewritten); count from Parquet footers, no data scan
    node_rows = sum(
        _footer_row_count(p)[0]
        for p in (
            os.path.join(res["parse_path"], "row_kind=node"),
            os.path.join(res["out_dir"], "canonical_mt"),
            res["dims_path"],
        )
        if os.path.isdir(p)
    )
    # edges are multi-root too: parse-time AST/overlay edges + the small
    # spec/astlink/inherit roots (each an independent linker pass output)
    parse_edge_rows = sum(
        _footer_row_count(p)[0]
        for p in (
            os.path.join(res["parse_path"], "row_kind=edge"),
            os.path.join(res["out_dir"], "dims", "rk=edge"),
            os.path.join(res["out_dir"], "edges_astlink"),
            os.path.join(res["out_dir"], "edges_inherit"),
        )
        if os.path.isdir(p)
    )
    n_rows = node_rows + linked_manifest.get("total_rows", linked_manifest.get("rows", 0)) + parse_edge_rows
    return {
        "sec": wall,
        "rows": n_rows,
        "triples_per_sec": n_rows / wall,
        "n_docs": n,
        "link_regime": res.get("link_regime"),
    }


def run_operator_queries() -> dict:
    """Times a representative operator subset over $GRAFT_SF_DIR."""
    from joern_ray.pipelines import queries as q

    picks = [
        "exact_dedup_documents",
        "token_count_ws",
        "pricing_summary",
        "customers_per_nation",
        "embedding_topk",
        "minhash_dedup_corpus",
        "quality_scores",
    ]
    out = {}
    for name in picks:
        t0 = time.perf_counter()
        getattr(q, name)(SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main_bench() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    build = run_cpg_build(NUM_CPUS)
    # flush the build's ~2GB of parquet writeback before timing the
    # operator queries (same cold-vs-warm interference as the corpus
    # generation; the sync itself is outside every per-query timer)
    os.sync()
    qtimes = {"cpg_build": round(build["sec"], 3)}
    qtimes.update(run_operator_queries())
    total = sum(qtimes.values())
    print(
        json.dumps(
            {
                "metric": "joern_ray_pipeline_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": os.path.basename(os.path.normpath(SF_DIR)),
                "num_cpus": NUM_CPUS,
                "triples_per_sec": round(build["triples_per_sec"], 1),
                "graph_rows": build["rows"],
                "n_docs": build["n_docs"],
                "link_regime": build["link_regime"],
            }
        )
    )
    ray.shutdown()


def main_child(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    build = run_cpg_build(num_cpus)
    print(json.dumps({"num_cpus": num_cpus, **{k: build[k] for k in ("sec", "rows", "triples_per_sec")}}))
    ray.shutdown()


def main_scaling() -> None:
    """Fresh process per parallelism level (N=8, 4N=32).

    Defaults to a 600k-doc corpus (~6x the bench default): at 100k docs
    the job is session-overhead-bound and the ratio measures Ray fixed
    costs, not the engine (BASELINE.md scaling section).  Takes ~12 min.
    """
    results = {}
    for n in (8, 32):
        # flush the PREVIOUS child's ~12GB output writeback before the
        # next child's timed run (same cold-vs-warm interference as the
        # corpus generation; measured: skipping this cost the 32-CPU
        # child ~45% wall and the efficiency ratio ~0.15)
        os.sync()
        time.sleep(3)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        env.setdefault("JOERN_RAY_BENCH_DOCS", "600000")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    thr8 = results[8]["triples_per_sec"]
    thr32 = results[32]["triples_per_sec"]
    eff = (thr32 / thr8) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "n_cpus_low": 8,
                "n_cpus_high": 32,
                "throughput_low": round(thr8, 1),
                "throughput_high": round(thr32, 1),
                "sec_low": round(results[8]["sec"], 2),
                "sec_high": round(results[32]["sec"], 2),
                "rows": results[32]["rows"],
                "sf": os.path.basename(os.path.normpath(SF_DIR)),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--child" in sys.argv:
        main_child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main_bench()
