"""Deterministic fuzz sweeps over the pure-numpy media codecs.

These lock in the edge-geometry behavior the point tests in
test_multimodal_codec.py don't enumerate: sub-block images (1x1, 1x2),
odd dimensions straddling MCU boundaries, extreme qualities, and the
baseline == progressive == restart-interval pixel-identity invariant
(all three encodings share the same quantized coefficients, so their
decodes must be bit-equal for every input, not just the anchor cases).
Seeds are fixed; the sweep is a few hundred decodes and runs in seconds.
"""
from __future__ import annotations

import numpy as np
import pytest

from search_ingest_ray.functions.gifcodec import decode_gif_frames, encode_gif
from search_ingest_ray.functions.jpegcodec import decode_jpeg, encode_jpeg


@pytest.mark.parametrize("h,w", [(1, 1), (1, 2), (3, 8), (8, 3), (9, 13),
                                 (15, 16), (17, 31)])
def test_jpeg_edge_geometry_roundtrips(h, w):
    rng = np.random.default_rng(1000 + h * 64 + w)
    for ch in (1, 3):
        img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        if ch == 1:
            img = img[:, :, 0]
        for q, sub, prog in ((5, "4:2:0", False), (50, "4:4:4", True),
                             (95, "4:2:0", True)):
            out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                          progressive=prog))
            assert out.shape[:2] == (h, w)
            assert out.shape[2] == (1 if ch == 1 else 3)


def test_jpeg_encoding_mode_pixel_identity_fuzz():
    """baseline / progressive / restart-interval encodings of the SAME
    image decode bit-identically (shared quantized coefficients)."""
    rng = np.random.default_rng(7)
    for _ in range(12):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        ch = int(rng.choice([1, 3]))
        q = int(rng.integers(3, 98))
        sub = str(rng.choice(["4:4:4", "4:2:0"]))
        img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        if ch == 1:
            img = img[:, :, 0]
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                       progressive=True))
        assert np.array_equal(base, prog), (h, w, ch, q, sub)
        rst = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                      restart_interval=int(rng.integers(1, 8))))
        assert np.array_equal(base, rst), (h, w, ch, q, sub)


def test_gif_multiframe_palette_roundtrip_fuzz():
    """LZW encode→decode is exact for palettized content across frame
    counts, palette sizes and non-byte-aligned dimensions."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ncol = int(rng.choice([2, 4, 16, 64, 256]))
        nfr = int(rng.integers(1, 4))
        step = 255 // max(ncol - 1, 1)
        frames = [(rng.integers(0, ncol, (h, w)) * step).astype(np.uint8)
                  for _ in range(nfr)]
        gif = encode_gif([np.stack([f, f, f], -1) for f in frames])
        out = decode_gif_frames(gif)
        assert len(out) == nfr
        for f, o in zip(frames, out):
            assert np.array_equal(o[:, :, 0], f)
