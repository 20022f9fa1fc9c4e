"""Multimodal (image/audio/video) columns: opaque binary payloads with
typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/torchaudio) are not available in this
environment, so the actual byte -> pixels/samples decode is STUBBED: a
clearly-marked ``NotImplementedError`` guards the real path, and a
deterministic fake decode (payload-hash-seeded features) keeps all of
the Ray-side plumbing — schema, actor signature, batch sizing, output
layout — real and testable. Swapping in a real decoder is a one-function
change in ``_decode_real``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),          # encoded bytes (opaque)
    ("width", pa.int32()),             # metadata (nullable where n/a)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _decode_real(payload: bytes, media_type: str):
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this "
        "environment — wire a decoder here when available")


def _decode_fake(payload: bytes, media_type: str, dim: int) -> np.ndarray:
    """Deterministic stand-in features: blake2b(payload) expanded to
    `dim` floats in [0, 1). Stable across workers/batch boundaries."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(h, "little") % (2 ** 32)
    rng = np.random.RandomState(seed)
    return rng.rand(dim)


class MediaFeatureExtractor:
    """Actor-pool stage: payload -> fixed-dim feature vector.

    Setup (the "model load") happens once per actor in __init__; batches
    should be small because payloads are heavy (size batch_size so
    batch_size x payload_bytes fits the worker heap).
    """

    def __init__(self, dim: int = 32, use_fake_decoder: bool = True):
        self.dim = dim
        self.use_fake = use_fake_decoder
        # stand-in for model/codec initialization
        self._ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = []
        for p, t in zip(payloads, types):
            if self.use_fake:
                feats.append(_decode_fake(p, t, self.dim))
            else:
                feats.append(_decode_real(p, t))
        out = batch.drop_columns(["payload"])  # shed heavy bytes early
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float64(), self.dim)))


def extract_media_features(media_ds, *, dim: int = 32, batch_size: int = 64,
                           concurrency=(1, 8)):
    """Actor-pool feature extraction over a media Dataset; batch size is
    deliberately small (heavy binary payloads)."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.RandomState(seed)
    rows = {"media_id": [], "media_type": [], "payload": [],
            "width": [], "height": [], "duration_ms": []}
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.bytes(256 + (i % 5) * 128)
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(64 if kind != "audio" else None)
        rows["height"].append(48 if kind != "audio" else None)
        rows["duration_ms"].append(None if kind == "image" else 1000 + i)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "media_type": pa.array(rows["media_type"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
    })
