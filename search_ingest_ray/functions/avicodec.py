"""Motion-JPEG AVI video: a REAL video container + codec path, stdlib-only.

AVI is RIFF (``RIFF <size> AVI ``): a ``hdrl`` LIST (``avih`` main header
+ one ``strl`` per stream with ``strh``/``strf``), a ``movi`` LIST whose
``00dc``/``00db`` chunks carry one compressed frame each (MJPEG = every
frame is an independent baseline JPEG), and an optional ``idx1`` index.
That makes MJPEG-in-AVI the one mainstream video format fully decodable
here: the container is pure ``struct`` walking and every frame decodes
through :mod:`.jpegcodec`'s numpy baseline/progressive JPEG decoder.
(MP4/WebM stay honest ``NotImplementedError`` boundaries — H.264/VP9
need real codec libraries.)

``encode_avi_mjpeg`` writes a spec-shaped fixture container (with idx1)
so tests and driver oracles exercise the same parser geometry a
capture-tool AVI would: even-byte chunk padding, nested LISTs, per-frame
chunk ids.  Layout per the public AVI RIFF spec (msdn AVIMAINHEADER /
AVISTREAMHEADER / BITMAPINFOHEADER).
"""

from __future__ import annotations

import struct

_FOURCC_FRAME = (b"00dc", b"00db", b"00dj")


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def avi_frames(data: bytes, max_frames: int | None = None) -> list[bytes]:
    """Walk the RIFF tree and return the raw payload of every video-frame
    chunk (``00dc``/``00db``/``00dj``) in stream order, recursing into
    ``movi`` and ``rec `` LISTs.  Tolerates a missing/lying ``idx1`` (the
    index is never consulted) and truncated trailing chunks (stops at the
    last complete one) — capture tools produce both."""
    if not is_avi(data):
        raise ValueError("not an AVI RIFF file")
    out: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body, nxt = pos + 8, pos + 8 + ln + (ln & 1)
            if tag == b"LIST":
                # recurse into a truncated LIST too: its complete leading
                # sub-chunks are still recoverable
                if body + 4 <= end and data[body:body + 4] in (b"movi",
                                                               b"rec "):
                    walk(body + 4, min(body + ln, end))
            elif tag in _FOURCC_FRAME and ln > 0:
                if body + ln > end:
                    return                   # truncated trailing chunk
                out.append(data[body:body + ln])
            else:
                if body + ln > end:
                    return
            if max_frames is not None and len(out) >= max_frames:
                return
            pos = nxt

    walk(12, len(data))
    return out


def decode_avi_frames(data: bytes, max_frames: int | None = None):
    """Decode every MJPEG frame to pixels (list of (h, w, 1|3) uint8) via
    the numpy JPEG decoder.  A non-JPEG frame payload raises — MJPEG is
    the only FOURCC this engine's codec set can truthfully decode."""
    from .jpegcodec import decode_jpeg
    return [decode_jpeg(f) for f in avi_frames(data, max_frames)]


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: list[bytes], *, width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal spec-shaped MJPEG AVI: one ``vids/MJPG`` stream whose
    ``00dc`` chunks are the given JPEG byte strings, plus an ``idx1``
    index (which :func:`avi_frames` deliberately ignores)."""
    if not frames:
        raise ValueError("need at least one frame")
    uspf = 1_000_000 // fps
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack("<14I", uspf, maxbuf * fps, 0, 0x10, len(frames),
                       0, 1, maxbuf, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames),
                          maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_chunks))
    idx, off = [], 4
    for f, ck in zip(frames, movi_chunks):
        idx.append(b"00dc" + struct.pack("<3I", 0x10, off, len(f)))
        off += len(ck)
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
