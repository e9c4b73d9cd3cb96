"""Text-analysis operators for large-scale training-data pipelines:
token counting, language ID, quality scoring, document fingerprinting.

These extend the engine beyond the reference's operator set (the task
brief lists them as first-class); the closest reference analogue is the
per-file metrics Report (`x2cpg/.../utils/Report.scala:27-60`) and the
joern-vectors feature hasher (`joern-cli/.../JoernVectors.scala:16-60`).

All stages are `map_batches(batch_format="pyarrow")` UDFs; regexes are
compiled at module import (per-process, the actor-state analogue for
stateless tasks).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer shape, minus unicode categories).
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_WS_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be for with on at by this that "
    "it as from".split()
)

# Tiny per-language character/digraph profiles for the n-gram heuristic
# language guesser (reference guesses language per file by extension +
# directory majority vote, `console/.../cpgcreation/package.scala:50-77`;
# webtext needs content-based guessing instead).
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset(["th", "he", "in", "er", "an", "re", "nd", " t", "on", "at"]),
    "de": frozenset(["en", "er", "ch", "de", "ei", "ie", "te", "sc", "un", "ng"]),
    "fr": frozenset(["es", "le", "de", "en", "re", "nt", "ou", "qu", "ai", "ur"]),
    "es": frozenset(["de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "ci"]),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_tokens_ws (whitespace) and n_tokens_bpe (BPE-ish regex)."""
    texts = batch.column(text_col).to_pylist()
    ws = [len(_WS_RE.findall(t or "")) for t in texts]
    bpe = [len(_BPE_RE.findall(t or "")) for t in texts]
    return batch.append_column(
        "n_tokens_ws", pa.array(ws, pa.int64())
    ).append_column("n_tokens_bpe", pa.array(bpe, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds quality heuristics: length, punct ratio, stopword ratio, mean
    word length, and a composite `quality_ok` flag (C4-style filters)."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    length = np.empty(n, np.int64)
    punct = np.empty(n, np.float64)
    stop = np.empty(n, np.float64)
    wlen = np.empty(n, np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        length[i] = len(t)
        words = _WS_RE.findall(t)
        nw = len(words)
        punct[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
        stop[i] = (
            sum(1 for w in words if w.lower() in _STOPWORDS) / nw if nw else 0.0
        )
        wlen[i] = sum(len(w) for w in words) / nw if nw else 0.0
    ok = (length >= 20) & (punct < 0.3) & (wlen >= 2.0) & (wlen <= 15.0)
    out = batch
    for name, arr, typ in (
        ("n_chars_q", length, pa.int64()),
        ("punct_ratio", punct, pa.float64()),
        ("stopword_ratio", stop, pa.float64()),
        ("mean_word_len", wlen, pa.float64()),
    ):
        out = out.append_column(name, pa.array(arr, typ))
    return out.append_column("quality_ok", pa.array(ok, pa.bool_()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds `lang_pred`: digraph-overlap heuristic language guess."""
    texts = batch.column(text_col).to_pylist()
    preds = []
    for t in texts:
        t = (t or "")[:2000].lower()
        grams = {t[i : i + 2] for i in range(len(t) - 1)}
        best, best_score = "und", -1
        for lang, prof in _LANG_PROFILES.items():
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best if best_score > 0 else "und")
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds `fingerprint`: polynomial rolling hash (base-257, mod 2^64 via
    uint64 wraparound) over the normalized text (whitespace-collapsed,
    lowercased) — order-sensitive, fully vectorized per document."""
    texts = batch.column(text_col).to_pylist()
    out = np.empty(len(texts), np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            norm = " ".join((t or "").lower().split()).encode()
            if not norm:
                out[i] = 0
                continue
            b = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
            powers = np.full(len(b), np.uint64(257), dtype=np.uint64)
            powers[0] = 1
            powers = np.cumprod(powers)[::-1]  # B^(n-1) .. B^0, wrapping
            out[i] = np.uint64((b * powers).sum()) & np.uint64((1 << 63) - 1)
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))
