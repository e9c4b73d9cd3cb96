"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

These are first-class training-data-pipeline operators layered on the
same shuffle machinery as the CPG linkers.  The reference's only dedup is
exact key-collision handling (`FullNameUniquenessPass.scala:31-127`,
first-wins `getOrElseUpdate` in `AstCreationPass.scala:38-40`); the
near-dup family is the web-scale extension the north star names
("min-hash dedup collapses equivalent entities").

Scale shapes:
- exact:   map (hash) → groupby(hash) → first-wins — one shuffle of
           (hash, id) pairs only, never the payload.
- minhash: map (shingle → K permutations → B bands) → flat-map band rows
           → groupby(band, bucket) → per-group candidate pairs verified
           by signature agreement.  Payload never shuffles; bands do.
- simhash: map (64-bit signature) → band on 4×16-bit chunks → groupby —
           exact-same-chunk candidates verified by Hamming distance.
- embedding: random-hyperplane LSH buckets → exact cosine within bucket.
"""

from __future__ import annotations

from ..util import resolve_pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXHASH = np.uint64((1 << 61) - 1)
_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, col: str, out_col: str = "content_hash64") -> pa.Table:
    """64-bit content hash of a string column (vectorized via polars)."""
    import polars as pl

    s = pl.from_arrow(batch.column(col)).cast(pl.Utf8).fill_null("")
    h = s.hash(seed=0)
    arr = pa.array(h.to_numpy() & np.uint64((1 << 63) - 1), pa.uint64())
    return batch.append_column(out_col, arr)


def exact_dedup(ds, col: str, id_col: str):
    """Hash-partition + per-group first (deterministic min id): returns
    Dataset of (id_col winner, n_dups) per distinct value of `col`."""

    def h(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, col)
        return b.select([id_col, "content_hash64"])

    def first_wins(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        return pa.table(
            {
                id_col: pa.array([pc.min(ids).as_py()], ids.type),
                "n_dups": pa.array([batch.num_rows], pa.int64()),
            }
        )

    return (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("content_hash64")
        .map_groups(first_wins, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hashes (vectorized FNV-style mix)."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t + " " * (k - len(t))
    b = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    if n <= 0:
        return np.zeros(1, np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n, np.uint64)
        for i in range(k):
            acc = acc * np.uint64(1099511628211) + b[i : i + n]
    return np.unique(acc)


class MinHasher:
    """K-permutation minhash state (a*x+b mod p), built once per actor —
    the stateful-stage pattern (parameters in __init__, per-batch work in
    __call__)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 128,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 7,
    ) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        # content-keyed signature memo (~0.5 KB/entry at num_perm=64)
        self._sig_cache: dict[int, np.ndarray] = {}
        self._sig_cache_max = 65536

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) via broadcasting; mod Mersenne prime
            prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1).astype(np.uint64)

    def signatures_batch(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signatures — vectorized, with a
        content-keyed memo: web/method corpora are dup-heavy (the parser
        template cache measures >90% hits), and identical text has an
        identical signature, so only DISTINCT texts get shingled and
        permuted.  The memo persists across batches in the worker
        process (tasks reuse workers)."""
        if not texts:
            return np.zeros((0, self.num_perm), np.uint64)
        keys = [hash(t or "") for t in texts]
        cache = self._sig_cache
        miss: dict[int, str] = {}
        for k, t in zip(keys, texts):
            if k not in cache and k not in miss:
                miss[k] = t or ""
        if miss:
            shingle_lists = [_shingles(t, self.shingle_k) for t in miss.values()]
            lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
            flat = np.concatenate(shingle_lists)
            with np.errstate(over="ignore"):
                # (num_perm, total_shingles)
                prod = (flat[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            mins = np.minimum.reduceat(prod, starts, axis=1).T.astype(np.uint64)
            if len(cache) + len(miss) > self._sig_cache_max:
                cache.clear()
            for i, k in enumerate(miss):
                cache[k] = mins[i]
        return np.stack([cache[k] for k in keys])

    def __call__(self, batch: pa.Table) -> pa.Table:
        """flat-map: one row per (doc, band) with the band bucket hash and
        the full signature (carried for verification downstream)."""
        texts = batch.column(self.text_col).to_pylist()
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "bucket": pa.array([], pa.uint64()),
                    "sig": pa.array([], pa.list_(pa.uint64())),
                }
            )
        sigs = self.signatures_batch(texts)  # (n, num_perm)
        r = self.rows_per_band
        with np.errstate(over="ignore"):
            # bucket hash per (doc, band): polynomial over the band chunk,
            # fully vectorized
            chunks = sigs.reshape(n, self.bands, r)
            bucket = np.zeros((n, self.bands), dtype=np.uint64)
            for j in range(r):  # tiny loop (r ~ 4-8)
                bucket = bucket * np.uint64(1000003) + chunks[:, :, j]
            bucket &= np.uint64((1 << 63) - 1)
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        sig_lists = sigs.tolist()
        out_sig = [sig_lists[i] for i in range(n) for _ in range(self.bands)]
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(bucket.reshape(-1), pa.uint64()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )


# Per-worker MinHasher memo: its state is DETERMINISTIC (seeded
# permutations), so plain tasks build it once per worker process — no
# pinned actor CPUs, which matters when the minhash overlaps other
# stages (the cpg equivalence pass runs concurrently with the edge
# write; a pinned pool starved it at low CPU counts).
_MINHASHER_MEMO: dict = {}


def minhasher_fn(**kwargs):
    key = tuple(sorted(kwargs.items()))

    def _fn(batch: pa.Table) -> pa.Table:
        mh = _MINHASHER_MEMO.get(key)
        if mh is None:
            if len(_MINHASHER_MEMO) > 4:
                _MINHASHER_MEMO.clear()
            mh = MinHasher(**kwargs)
            _MINHASHER_MEMO[key] = mh
        return mh(batch)

    return _fn


def minhash_lsh_pairs(ds, text_col="text", id_col="doc_id", num_perm=128, bands=16, threshold=0.7, concurrency=None):
    """Candidate near-dup pairs via banded minhash LSH, verified by
    signature agreement (estimated Jaccard ≥ threshold).  Returns a
    Dataset of (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated
    across bands by keeping each pair only in its first matching band."""

    band_rows = ds.map_batches(
        minhasher_fn(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
    ).materialize()  # groupby sampling must not re-run the MinHasher stage

    def pairs_in_bucket(batch: pa.Table) -> pa.Table:
        """Vectorized all-pairs signature agreement, capped per bucket.

        Boilerplate-heavy web corpora create near-clique buckets; an
        uncapped pair list is O(n²) per bucket and explodes (observed:
        a 30k-doc bench wedged here before the cap).  Buckets larger
        than `max_bucket` are deterministically sampled (sorted by id,
        evenly strided) and the truncation is recorded on every emitted
        row — no silent cap.  For full-corpus dedup use
        `minhash_dedup` (cluster mapping, O(n) per bucket) instead.
        """
        max_bucket = 256
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
                "band": pa.array([], pa.int32()),
                "bucket_truncated": pa.array([], pa.bool_()),
            }
        )
        n = batch.num_rows
        if n < 2:
            return empty
        ids = np.asarray(batch.column(id_col).to_pylist())
        order = np.argsort(ids)
        truncated = n > max_bucket
        if truncated:
            order = order[:: max(1, n // max_bucket)][:max_bucket]
        ids_s = ids[order]
        sig_m = np.asarray(
            batch.take(pa.array(order)).column("sig").to_pylist(), dtype=np.uint64
        )  # (m, K) — single vectorized list-column conversion
        band = batch.column("band")[0].as_py()
        # est jaccard matrix in one broadcast: (m, m)
        est = (sig_m[:, None, :] == sig_m[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(len(ids_s), k=1)
        mask = est[iu, ju] >= threshold
        ii, jj = iu[mask], ju[mask]
        return pa.table(
            {
                "id_a": pa.array(ids_s[ii], pa.int64()),
                "id_b": pa.array(ids_s[jj], pa.int64()),
                "est_jaccard": pa.array(est[ii, jj], pa.float64()),
                "band": pa.array([band] * len(ii), pa.int32()),
                "bucket_truncated": pa.array([truncated] * len(ii), pa.bool_()),
            }
        )

    pairs = band_rows.groupby(["band", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    ).materialize()  # the distinct's sampling must not re-mine pairs

    # a pair can surface in several bands; est_jaccard is computed from
    # the FULL signatures so it is identical in every band — dedup is a
    # plain distinct on (id_a, id_b, est_jaccard) via the BUILT-IN
    # vectorized count aggregation (a per-group map_groups UDF here was
    # the measured bottleneck: ~1 python call per pair)
    uniq = pairs.groupby(["id_a", "id_b", "est_jaccard"]).count()
    return uniq.map_batches(
        lambda b: b.select(["id_a", "id_b", "est_jaccard"]), batch_format="pyarrow"
    )


def minhash_dedup(ds, text_col="text", id_col="doc_id", num_perm=128, bands=16, concurrency=None):
    """Scalable near-dup COLLAPSE: (id -> canonical_id) cluster mapping.

    TWO-LEVEL (exact -> near), the shape that survives dup-heavy web
    corpora:

    1. exact content collapse — group on hash64(text), representative =
       min id.  Shuffles TWO integer columns, never the text; identical
       texts are Jaccard-1 near-dups, so this changes no cluster.
       (63-bit hash equality treated as content equality — same caveat
       as `exact_dedup`.)
    2. banded MinHash over the DISTINCT texts only (reps), per (band,
       bucket) emit (member, min) — O(group), no pair explosion — then a
       second groupby takes the global min across bands.  Web corpora
       are >90% duplicate content, so the band shuffle shrinks 10-20x.
    3. members map through their rep's canonical via a broadcast of the
       (small) collapsed-rep mapping.

    `ds` is consumed twice (projection + rep-text pull) — pass a
    checkpoint/Parquet-backed Dataset so re-execution is a re-read.
    One union-find hop; documents transitively linked only through
    longer chains keep separate canonicals (bounded-round choice, same
    spirit as the reference's fixed-iteration type recovery,
    `XTypeRecovery.scala:143-145`).  The broadcast in step 3 bounds this
    regime at O(distinct near-dup reps) driver memory; past that, swap
    step 3 for a shuffle join on `rep`."""
    import ray

    from ..functions.hashing import hash64

    # ---- level 1: exact content collapse ------------------------------
    def chash_proj(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ch = np.array([hash64(t or "") for t in texts], dtype=np.uint64)
        return pa.table(
            {id_col: batch.column(id_col), "chash": pa.array(ch, pa.uint64())}
        )

    m1 = ds.map_batches(chash_proj, batch_format="pyarrow").materialize()

    def exact_group(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        lo = pc.min(ids).as_py()
        return pa.table(
            {id_col: ids, "rep": pa.array([lo] * batch.num_rows, ids.type)}
        )

    m1_map = (
        m1.groupby("chash")
        .map_groups(exact_group, batch_format="pyarrow")
        .map_batches(lambda b: b.select([id_col, "rep"]), batch_format="pyarrow")
        .materialize()
    )

    # distinct-rep id set (one per distinct content)
    rep_ids: set = set()
    for b in m1_map.iter_batches(batch_format="pyarrow"):
        rep_ids.update(pc.unique(b.column("rep")).to_pylist())
    rep_ref = ray.put(frozenset(rep_ids))

    # ---- level 2: banded MinHash over distinct texts ------------------
    rep_key = rep_ref.hex()

    def rep_filter(batch: pa.Table) -> pa.Table:
        arr = _MINHASHER_MEMO.get(rep_key)
        if arr is None:  # once per worker
            arr = pa.array(list(ray.get(rep_ref)), pa.int64())
            _MINHASHER_MEMO[rep_key] = arr
        return batch.filter(
            pc.is_in(batch.column(id_col), value_set=arr.cast(batch.column(id_col).type))
        )

    band_rows = ds.map_batches(rep_filter, batch_format="pyarrow").map_batches(
        minhasher_fn(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.select([id_col, "band", "bucket"]), batch_format="pyarrow"
    ).materialize()  # groupby sampling must not re-run the MinHasher stage

    def bucket_min(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        lo = pc.min(ids).as_py()
        return pa.table(
            {
                id_col: ids,
                "cand": pa.array([lo] * batch.num_rows, ids.type),
            }
        )

    members = band_rows.groupby(["band", "bucket"]).map_groups(
        bucket_min, batch_format="pyarrow"
    )

    def global_min(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col).slice(0, 1),
                "canonical_id": pa.array(
                    [pc.min(batch.column("cand")).as_py()], batch.column("cand").type
                ),
            }
        )

    rep_canon = members.groupby(id_col).map_groups(global_min, batch_format="pyarrow")

    # ---- level 3: member -> rep -> canonical --------------------------
    # only COLLAPSED reps matter (canonical != self) — a small table,
    # path-compressed (a bucket min can itself collapse through another
    # bucket; compression makes the final mapping idempotent), then
    # applied as a vectorized index_in/take lookup
    cmap: dict = {}
    for b in rep_canon.iter_batches(batch_format="pyarrow"):
        eq = b.filter(pc.not_equal(b.column(id_col), b.column("canonical_id")))
        cmap.update(
            zip(eq.column(id_col).to_pylist(), eq.column("canonical_id").to_pylist())
        )
    for k in list(cmap):
        v = cmap[k]
        seen = {k}
        while v in cmap and v not in seen:
            seen.add(v)
            v = cmap[v]
        cmap[k] = v
    import os as _os

    if _os.environ.get("JOERN_DEDUP_DEBUG"):
        import sys as _sys

        zk = sum(1 for k in cmap if k == 0)
        zv = sum(1 for v in cmap.values() if v == 0)
        print(
            f"[minhash_dedup] cmap={len(cmap)} zero_keys={zk} zero_vals={zv} "
            f"reps={len(rep_ids)} zero_rep={0 in rep_ids}",
            file=_sys.stderr,
            flush=True,
        )
    ck, cv = list(cmap.keys()), list(cmap.values())

    # numpy searchsorted lookup (NOT pc.index_in/take: take over a
    # null-bearing chunked index array returned corrupted values inside
    # Ray workers — observed zeros fabricated from clean inputs)
    ck_np = np.array(ck, dtype=np.int64)
    cv_np = np.array(cv, dtype=np.int64)
    _order = np.argsort(ck_np)
    sk, sv = ck_np[_order], cv_np[_order]

    def finalize(batch: pa.Table) -> pa.Table:
        rep = batch.column("rep").combine_chunks()
        rep_np = rep.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, rep_np), len(sk) - 1)
            hit = sk[pos] == rep_np
            canon = np.where(hit, sv[pos], rep_np)
        else:
            canon = rep_np
        return pa.table(
            {
                id_col: batch.column(id_col),
                "canonical_id": pa.array(canon, rep.type),
            }
        )

    return m1_map.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification / small-scale pairwise)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(a, k).tolist()), set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str, k: int = 4) -> int:
    """64-bit SimHash over word k=1 tokens (hash-weighted bit votes)."""
    tokens = (text or "").lower().split()
    if not tokens:
        return 0
    import polars as pl

    h = pl.Series(tokens).hash(seed=1).to_numpy()
    bits = ((h[:, None] >> np.arange(64)[None, :].astype(np.uint64)) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64).astype(np.uint64)).sum() & np.uint64((1 << 63) - 1))


def simhash_batch(batch: pa.Table, text_col="text") -> pa.Table:
    vals = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(vals, pa.uint64()))


def simhash_near_dup_pairs(ds, text_col="text", id_col="doc_id", max_hamming=3):
    """Near-dup pairs by SimHash banding: 4 chunks of 16 bits — any pair
    within Hamming distance 3 shares at least one exact chunk (pigeonhole),
    so groupby(chunk_idx, chunk_value) finds all candidates."""

    def explode(batch: pa.Table) -> pa.Table:
        b = simhash_batch(batch.select([id_col, text_col]), text_col)
        ids = b.column(id_col).to_pylist()
        sh = b.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        out_id, out_chunk, out_val, out_sim = [], [], [], []
        for i, d in enumerate(ids):
            for c in range(4):
                out_id.append(d)
                out_chunk.append(c)
                out_val.append(int((sh[i] >> np.uint64(16 * c)) & np.uint64(0xFFFF)))
                out_sim.append(int(sh[i]))
        return pa.table(
            {
                id_col: pa.array(out_id),
                "chunk": pa.array(out_chunk, pa.int32()),
                "chunk_val": pa.array(out_val, pa.int64()),
                "simhash": pa.array(out_sim, pa.uint64()),
            }
        )

    def pairs(batch: pa.Table) -> pa.Table:
        """Vectorized XOR-popcount pairs, capped per chunk group (see
        minhash pairs for the boilerplate-clique rationale)."""
        max_bucket = 256
        ids = np.asarray(batch.column(id_col).to_pylist())
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        if len(order) > max_bucket:
            order = order[:: max(1, len(order) // max_bucket)][:max_bucket]
        ids_s, sh_s = ids[order], sh[order]
        m = len(ids_s)
        if m < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        x = sh_s[:, None] ^ sh_s[None, :]  # (m, m) uint64
        # popcount via byte view + unpackbits-free table
        b = x.view(np.uint8).reshape(m, m, 8)
        ham = _POPCNT[b].sum(axis=2).astype(np.int64)
        iu, ju = np.triu_indices(m, k=1)
        keep = (ham[iu, ju] <= max_hamming) & (ids_s[iu] != ids_s[ju])
        ii, jj = iu[keep], ju[keep]
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids_s[ii], ids_s[jj]), pa.int64()),
                "id_b": pa.array(np.maximum(ids_s[ii], ids_s[jj]), pa.int64()),
                "hamming": pa.array(ham[ii, jj], pa.int64()),
            }
        )

    def dedup_pair(batch: pa.Table) -> pa.Table:
        return batch.take([0])

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "chunk_val"])
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(dedup_pair, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------


class HyperplaneBucketer:
    """Stateful stage: random hyperplanes drawn once per actor (fixed
    seed) → sign-bit bucket per vector."""

    def __init__(self, dim: int, n_planes: int = 12, vec_col: str = "embedding", seed: int = 11) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes)).astype(np.float32)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(self.vec_col).to_pylist(), dtype=np.float32)
        proj = vecs @ self.planes  # (n, planes) — one matmul per batch
        bits = (proj > 0).astype(np.uint64)
        bucket = np.zeros(len(vecs), np.uint64)
        for p in range(bits.shape[1]):
            bucket |= bits[:, p] << np.uint64(p)
        norms = np.linalg.norm(vecs, axis=1)
        return batch.append_column("bucket", pa.array(bucket, pa.uint64())).append_column(
            "norm", pa.array(norms, pa.float64())
        )


def embedding_near_dup_pairs(ds, dim: int, id_col="vec_id", vec_col="embedding", threshold=0.95, n_planes=12, concurrency=None):
    """Cosine near-dup pairs: LSH bucket by hyperplane signs, exact cosine
    within each bucket (payload shuffles only per-bucket)."""

    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs={"dim": dim, "vec_col": vec_col, "n_planes": n_planes},
        batch_format="pyarrow",
        concurrency=resolve_pool(concurrency),
    )

    def pairs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        iu, ju = np.triu_indices(n, k=1)
        mask = sims[iu, ju] >= threshold
        ii, jj = iu[mask], ju[mask]
        lo = np.minimum(ids[ii], ids[jj])
        hi = np.maximum(ids[ii], ids[jj])
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(sims[ii, jj].astype(np.float64)),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")
