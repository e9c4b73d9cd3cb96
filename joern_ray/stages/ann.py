"""Approximate-nearest-neighbor search over an embedding column.

- `brute_force_topk`: baseline — broadcast query matrix (`ray.put` once,
  read per actor), one numpy matmul per batch, per-batch local top-k,
  global top-k by a final small sort.  Never materializes the corpus.
- `ivf_topk`: scale path — coarse k-means centroids trained on a sample
  (driver-side numpy, bounded iterations), vectors assigned to cells in
  one map pass; queries probe only the `n_probe` nearest cells, so the
  matmul touches a fraction of the corpus.
"""

from __future__ import annotations

from ..util import resolve_pool

import numpy as np
import pyarrow as pa


class BruteForceScorer:
    """Actor-pool stage: per batch, cosine scores against the broadcast
    query matrix; emits local top-k rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str) -> None:
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q = (q / qn).astype(np.float32)  # (nq, dim)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        vecs = np.asarray(batch.column(self.vec_col).to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = self.q @ unit.T  # (nq, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def _global_topk(local, k: int, id_col: str):
    """Local top-k rows -> global top-k per query via one small sort on
    the already-reduced candidate set (≤ k rows per query per block)."""
    ds = local.sort(["query_id", "cosine"], descending=[False, True])

    def head_k(batch: pa.Table) -> pa.Table:
        return batch.take(list(range(min(k, batch.num_rows))))

    return ds.groupby("query_id").map_groups(head_k, batch_format="pyarrow")


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding", concurrency=None):
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float32))
    local = ds.map_batches(
        BruteForceScorer,
        fn_constructor_args=(qref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=resolve_pool(concurrency),
    )
    return _global_topk(local, k, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 3) -> np.ndarray:
    """Bounded-iteration k-means on a driver-side sample (the reference
    pattern of fixed iterations over fixpoint, `XTypeRecovery.scala:25`)."""
    rng = np.random.RandomState(seed)
    n = len(sample)
    cents = sample[rng.choice(n, size=min(n_cells, n), replace=False)].astype(np.float32)
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(0)
    return cents


class IvfScorer:
    """Searches only vectors whose cell is among each query's n_probe
    nearest cells."""

    def __init__(self, queries_ref, cents_ref, k: int, n_probe: int, id_col: str, vec_col: str) -> None:
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        cents = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) else cents_ref
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q = (q / qn).astype(np.float32)
        self.cents = cents
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        self.probe = np.argsort(d, axis=1)[:, :n_probe]  # (nq, n_probe)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        vecs = np.asarray(batch.column(self.vec_col).to_pylist(), dtype=np.float32)
        d = ((vecs[:, None, :] - self.cents[None, :, :]) ** 2).sum(-1)
        cell = d.argmin(1)  # (n,)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.q)):
            m = np.isin(cell, self.probe[qi])
            if not m.any():
                continue
            sims = unit[m] @ self.q[qi]
            sel = np.argpartition(-sims, kth=min(self.k, len(sims)) - 1)[: self.k]
            for j in sel:
                out_q.append(qi)
                out_id.append(int(ids[m][j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_cells: int = 16, n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding", sample_size: int = 2048, concurrency=None):
    import ray

    sample = np.asarray(
        ds.limit(sample_size).to_pandas()[vec_col].tolist(), dtype=np.float32
    )
    cents = train_centroids(sample, n_cells)
    qref = ray.put(np.asarray(queries, dtype=np.float32))
    cref = ray.put(cents)
    local = ds.map_batches(
        IvfScorer,
        fn_constructor_args=(qref, cref, k, n_probe, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=resolve_pool(concurrency),
    )
    return _global_topk(local, k, id_col)
