"""Method feature vectors — the `joern-vectors` analog.

Reference: `joern-cli/.../JoernVectors.scala:16-60` emits bag-of-features
vectors per node/method via feature hashing ("Pattern-based Vulnerability
Discovery" ch. 3).  Here: one vector per METHOD, features are the
(label, name-or-operator) pairs of every node in the method subtree,
hash-bucketed into a fixed dimension — runs fused into a parse pass
(actor pool, zero joins) like the DOT exporter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64
from ..parsing.astmodel import PNode
from ..parsing.parser import FragmentParser, ParseError

VECTOR_DIM = 128


def method_feature_vector(method: PNode, dim: int = VECTOR_DIM) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float32)

    def walk(n: PNode) -> None:
        feat = f"{n.label}\x1f{n.name or n.label}"
        vec[hash64(feat) % dim] += 1.0
        for c in n.children:
            walk(c)

    walk(method)
    return vec


class MethodVectorizer:
    """Actor-pool stage: fragments -> (url, fragment_idx,
    method_full_name, vector) rows."""

    def __init__(self, dim: int = VECTOR_DIM) -> None:
        self.parsers = {d: FragmentParser(d) for d in ("c", "cpp", "java", "javascript")}
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "row_kind" in batch.column_names:
            batch = batch.filter(pc.equal(batch.column("row_kind"), "fragment"))
        o_url, o_idx, o_fqn, o_vec = [], [], [], []
        for url, idx, lang, code in zip(
            batch.column("url").to_pylist(),
            batch.column("fragment_idx").to_pylist(),
            batch.column("frag_lang").to_pylist(),
            batch.column("code").to_pylist(),
        ):
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
                o_vec.append(method_feature_vector(m, self.dim).tolist())
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "fragment_idx": pa.array(o_idx, pa.int32()),
                "method_full_name": pa.array(o_fqn, pa.string()),
                "vector": pa.array(o_vec, pa.list_(pa.float32())),
            }
        )


def method_vectors(docs_ds, dim: int = VECTOR_DIM, concurrency=(1, 8)):
    from ..stages.extract import detect_fragments_batch

    return docs_ds.map_batches(
        detect_fragments_batch, batch_format="pyarrow"
    ).map_batches(
        MethodVectorizer,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
