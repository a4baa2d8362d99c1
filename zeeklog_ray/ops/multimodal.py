"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are NOT in this container, so the actual
decode is stubbed (``decoder="fake"`` produces deterministic features from
the bytes; ``decoder="real"`` raises ``NotImplementedError`` at the exact
seam where PIL / torchaudio / ffmpeg would plug in).  Everything Ray-side is
real and tested: the Arrow schema (binary + metadata columns), small batch
sizes for large payloads, the actor signature (decode state in
``__init__``), and the partitioned output layout.

Schema convention::

    item_id : string
    payload : binary        # encoded image/audio/video bytes
    modality: string        # 'image' | 'audio' | 'video'
    meta    : string        # JSON: {width,height,...} / {sample_rate,...}
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

import ray.data

FEATURE_DIM = 16


def media_schema() -> pa.Schema:
    return pa.schema([
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("modality", pa.string()),
        ("meta", pa.string()),
    ])


def synth_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake media corpus for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    mods = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, n)]
    sizes = rng.integers(256, 4096, n)
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    metas = [json.dumps({"bytes": int(s), "modality": m})
             for s, m in zip(sizes, mods)]
    return pa.table({
        "item_id": pa.array([f"m-{i:06d}" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
        "modality": pa.array(mods, pa.string()),
        "meta": pa.array(metas, pa.string()),
    })


class MediaFeatureExtractor:
    """Actor stage: decode payload → fixed-dim feature vector.

    ``__init__`` is where a real model/codec would load (once per actor);
    ``__call__`` handles one Arrow batch.  With ``decoder='fake'`` the
    "features" are a deterministic digest of the payload bytes — stable
    across processes, so tests can assert exact values.  Keep
    ``batch_size`` SMALL for real media (payload × batch × concurrency
    must fit the worker heap — the multimodal sizing rule).
    """

    def __init__(self, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder

    def _decode(self, payload: bytes, modality: str) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "media decode requires PIL/torchaudio/ffmpeg — not available "
                "in this container; plug the real decoder in here")
        d = hashlib.blake2b(payload, digest_size=FEATURE_DIM,
                            person=modality.encode()[:16].ljust(16, b"\0")).digest()
        return np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mods = batch["modality"].to_pylist()
        feats = np.stack([self._decode(p, m) for p, m in zip(payloads, mods)]) \
            if len(payloads) else np.zeros((0, FEATURE_DIM), np.float32)
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * FEATURE_DIM,
                                     FEATURE_DIM, dtype=np.int32))
        fcol = pa.ListArray.from_arrays(offsets,
                                        pa.array(feats.ravel(), pa.float32()))
        return pa.table({
            "item_id": batch["item_id"],
            "modality": batch["modality"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "features": fcol,
        })


def extract_features(ds: "ray.data.Dataset", decoder: str = "fake",
                     batch_size: int = 64,
                     concurrency: tuple[int, int] = (1, 4)) -> "ray.data.Dataset":
    """Actor-pool feature extraction over a media table.

    ``batch_size=64`` deliberately small: payloads are large binaries; a
    batch × pool must fit in worker heap (the object store spills the rest).
    """
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"decoder": decoder})
