"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment — clearly marked below); everything Ray-side is real and tested:
schemas, actor-pool stage shape, small batch sizes for wide binary rows,
and output layout.  Swap ``_decode_image_stub`` for a real decoder (PIL /
ffmpeg) in production without touching the pipeline shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("sha", pa.string()),
    ("feature", pa.list_(pa.float32())),
])


def _decode_image_stub(data: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decoder — deterministic fake in lieu of PIL/libjpeg.

    Production: replace with a real decode returning (width, height,
    feature_vector).  The fake derives stable pseudo-dimensions and an
    8-dim feature from the content hash so tests are deterministic.
    """
    h = hashlib.blake2b(data, digest_size=16).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = (np.frombuffer(h[8:], dtype=np.uint8).astype(np.float32) / 255.0)
    return width, height, feat


class ImageFeatureStage:
    """Actor-pool stage: decode + feature-extract image binaries.

    Usage: ``ds.map_batches(ImageFeatureStage, batch_size=64,
    concurrency=(2, 8), num_cpus=1, batch_format="pyarrow")`` — small
    batches because each row can be MBs of binary; model/codec state loads
    once per actor in ``__init__``.
    """

    def __init__(self, data_col: str = "data", id_col: str = "media_id"):
        self.data_col = data_col
        self.id_col = id_col
        # production: load the decoder / feature model here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, nbytes, shas, feats = [], [], [], [], [], []
        for mid, data in zip(batch[self.id_col].to_pylist(),
                             batch[self.data_col].to_pylist()):
            data = data or b""
            w, h, f = _decode_image_stub(data)
            ids.append(str(mid))
            widths.append(w)
            heights.append(h)
            nbytes.append(len(data))
            shas.append(hashlib.sha1(data).hexdigest())
            feats.append(f)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "n_bytes": pa.array(nbytes, pa.int64()),
            "sha": pa.array(shas, pa.string()),
            "feature": pa.array([np.asarray(f, dtype=np.float32) for f in feats],
                                pa.list_(pa.float32())),
        })


class FrameSampleStage:
    """Actor-pool stage: sample N pseudo-frames per video binary.

    STUB: real frame extraction needs ffmpeg; the fake emits deterministic
    frame offsets + content-hash features, preserving the real output
    layout (one row per sampled frame — a flat_map-shaped explosion)."""

    def __init__(self, data_col: str = "data", id_col: str = "media_id",
                 frames: int = 4):
        self.data_col = data_col
        self.id_col = id_col
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mid_out, frame_out, feat_out = [], [], []
        for mid, data in zip(batch[self.id_col].to_pylist(),
                             batch[self.data_col].to_pylist()):
            data = data or b""
            for fr in range(self.frames):
                h = hashlib.blake2b(data + fr.to_bytes(4, "big"),
                                    digest_size=8).digest()
                mid_out.append(str(mid))
                frame_out.append(fr)
                feat_out.append(np.frombuffer(h, dtype=np.uint8).astype(np.float32))
        return pa.table({
            "media_id": pa.array(mid_out, pa.string()),
            "frame": pa.array(frame_out, pa.int32()),
            "feature": pa.array(feat_out, pa.list_(pa.float32())),
        })
