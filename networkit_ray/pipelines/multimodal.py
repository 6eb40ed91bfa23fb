"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL/opencv/librosa/av) are NOT in this container, so
the decode kernels are stubbed exactly as the build spec directs: each stage
is a real actor-pool map_batches with the real schema/batch-size/actor
signature and output layout, and the *decoder* is either
``NotImplementedError`` (mode="real") or a deterministic fake
(mode="fake", default) whose output depends only on the payload bytes —
so the Ray-side plumbing is fully tested and the real decoder is a drop-in.

Schemas:
    media(media_id: int64, kind: string, payload: binary,
          meta_width: int32, meta_height: int32, meta_sample_rate: int32)
    image_features(media_id, feat: list<float>[FEAT_DIM])
    frames(media_id, frame_idx: int64, payload: binary)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEAT_DIM = 16

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_sample_rate", pa.int32()),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: payload bytes ->
    pseudo-pixel array seeded by the payload digest."""
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


class DecodeAndFeaturize:
    """Actor-pool stage: decode binary payload -> FEAT_DIM feature vector.

    Real implementation would load the model/codec once here (__init__) and
    run batched inference in __call__; small batch_size because payloads are
    wide (set batch_size explicitly at the call site for real media).
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/opencv, not available in this "
                "container; use mode='fake' for plumbing tests"
            )
        return _fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            px = self._decode(payload).astype(np.float64)
            # channel means/stds + coarse 2x2 pooling: deterministic features
            f = np.concatenate(
                [
                    px.mean(axis=(0, 1)),
                    px.std(axis=(0, 1)),
                    px.reshape(2, 4, 2, 4, 3).mean(axis=(1, 3)).reshape(-1)[: FEAT_DIM - 6],
                ]
            )[:FEAT_DIM]
            feats.append(f.astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feat": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def decode_features(media_ds, mode: str = "fake", concurrency: int = 2, batch_size: int = 64):
    """media -> image_features via the actor pool (small batches: payloads
    are wide; batch_size x concurrency bounds worker heap)."""
    return media_ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


class FrameSampler:
    """video payload -> every k-th 'frame' (fake: fixed-size byte slices)."""

    def __init__(self, every: int = 10, frame_bytes: int = 256, mode: str = "fake"):
        self.every = every
        self.frame_bytes = frame_bytes
        if mode == "real":
            raise NotImplementedError("video demux requires pyav")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, payloads = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            n_frames = max(1, len(payload) // self.frame_bytes)
            for fi in range(0, n_frames, self.every):
                ids.append(mid)
                idxs.append(fi)
                payloads.append(
                    payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]
                )
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def sample_frames(media_ds, every: int = 10, concurrency: int = 2, batch_size: int = 16):
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def synthetic_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests/benches."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image" if i % 2 == 0 else "video" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_width": pa.array([8] * n, type=pa.int32()),
            "meta_height": pa.array([8] * n, type=pa.int32()),
            "meta_sample_rate": pa.array([0] * n, type=pa.int32()),
        }
    )
