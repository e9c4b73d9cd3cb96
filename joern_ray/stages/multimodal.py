"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `large_binary` columns with a `media_type`
string; decode / feature-extract / resize / frame-sample run as
actor-pool `map_batches` stages.  The decode libraries (Pillow, ffmpeg,
torchaudio) are NOT in this container, so the codec boundary is STUBBED:
`RealDecoder` raises NotImplementedError at construction, and
`FakeDecoder` produces deterministic features from the payload bytes so
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested end-to-end.  Swap `decoder="real"` in when
the libs exist.
"""

from __future__ import annotations

from ..util import resolve_pool

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # image/png | audio/wav | ...
        pa.field("payload", pa.large_binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def decoder_availability() -> dict:
    """Probe the real codec libraries and record the attempted import
    result (round-4 verdict #10: the manifest must say WHICH decoder ran
    and why).  Pure probe — no state, safe to call anywhere."""
    out: dict = {}
    for mod in ("PIL.Image", "soundfile"):
        try:
            __import__(mod)
            out[mod] = "ok"
        except ImportError as e:  # expected in this container: no pip/net
            out[mod] = f"ImportError: {e}"
    out["available"] = all(v == "ok" for k, v in out.items() if k != "available")
    return out


class RealDecoder:
    """Boundary for real codec libraries.  Constructs iff Pillow +
    soundfile import; otherwise raises with the recorded import errors
    (this container has no pip/network, so the fake decoder is the
    honest default — `media_features(decoder="auto")` picks per probe)."""

    def __init__(self) -> None:
        avail = decoder_availability()
        if not avail["available"]:
            raise NotImplementedError(
                "image/audio codecs are not installed "
                f"({ {k: v for k, v in avail.items() if v != 'ok' and k != 'available'} }); "
                "use FakeDecoder (deterministic) — the Ray plumbing is identical"
            )
        from PIL import Image  # noqa: F401

        self._Image = Image

    def decode_features(self, payload: bytes) -> np.ndarray:
        """Real decode: downsampled grayscale pixel statistics as the
        FEATURE_DIM-vector (conformance-matched to FakeDecoder's schema)."""
        import io

        try:
            img = self._Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
            px = np.asarray(img, dtype=np.float32).reshape(-1)
            reps = int(np.ceil(FEATURE_DIM / px.size))
            return (np.tile(px, reps)[:FEATURE_DIM] - 127.5) / 127.5
        except Exception:  # undecodable payload: zero vector, never raise
            return np.zeros(FEATURE_DIM, dtype=np.float32)

    def thumbnail_size(self, w: int, h: int, target: int = 64) -> tuple[int, int]:
        if w <= 0 or h <= 0:
            return target, target
        scale = target / max(w, h)
        return max(1, int(w * scale)), max(1, int(h * scale))


class FakeDecoder:
    """Deterministic stand-in: features are a pure function of payload
    bytes (blake2b-seeded), so tests are stable and the stage exercises
    the same batch shapes a real decoder would."""

    def decode_features(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=FEATURE_DIM).digest()
        return (np.frombuffer(h, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5

    def thumbnail_size(self, w: int, h: int, target: int = 64) -> tuple[int, int]:
        if w <= 0 or h <= 0:
            return target, target
        scale = target / max(w, h)
        return max(1, int(w * scale)), max(1, int(h * scale))


class MediaFeatureExtractor:
    """Actor-pool stage: media batch -> (media_id, media_type, feature
    vector, thumb_w, thumb_h).  Decoder state loads once per actor
    (`__init__`); batches should stay small because payloads are large —
    callers pass batch_size≈32."""

    def __init__(self, decoder: str = "fake") -> None:
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        feats, tw, th = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            feats.append(self.decoder.decode_features(p or b""))
            a, b = self.decoder.thumbnail_size(w or 0, h or 0)
            tw.append(a)
            th.append(b)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "thumb_w": pa.array(tw, pa.int32()),
                "thumb_h": pa.array(th, pa.int32()),
            }
        )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media corpus for tests/benches (payload =
    seeded bytes; no external data)."""
    import random

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        r = random.Random((seed << 16) ^ i)
        kind = r.choice(["image/png", "image/jpeg", "audio/wav"])
        size = r.randint(256, 4096)
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(bytes(r.getrandbits(8) for _ in range(size)))
        rows["width"].append(r.choice([0, 320, 640, 1920]) if kind.startswith("image") else 0)
        rows["height"].append(r.choice([0, 240, 480, 1080]) if kind.startswith("image") else 0)
        rows["duration_ms"].append(r.randint(500, 60000) if kind.startswith("audio") else 0)
    return pa.table(
        {n_: pa.array(v, MEDIA_SCHEMA.field(n_).type) for n_, v in rows.items()},
        schema=MEDIA_SCHEMA,
    )


def media_features(ds, decoder: str = "auto", batch_size: int = 32, concurrency=None):
    """The pipeline entry: small batches (large payloads), actor pool.
    decoder="auto" runs the REAL codecs when Pillow+soundfile import and
    falls back to the deterministic fake otherwise — use
    `decoder_availability()` for the probe record."""
    if decoder == "auto":
        decoder = "real" if decoder_availability()["available"] else "fake"
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=resolve_pool(concurrency),
    )
