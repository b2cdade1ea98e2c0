"""Motion-JPEG MP4 (ISO BMFF): the second REAL video container path.

MP4 is a box tree (``size(4BE) + fourcc``; ``size==1`` → 64-bit
largesize, ``size==0`` → to-EOF).  Sample data lives in ``mdat``; the
map from sample number → byte range lives in the video track's sample
tables under ``moov/trak/mdia/minf/stbl``:

- ``stsd``  — sample descriptions; entry fourcc names the codec.  The
  MJPEG fourccs (``jpeg``/``mjpa``/``mjpb``/``dmb1``/``AVDJ``) mean
  every sample is an independent baseline JPEG, decodable by
  :mod:`.jpegcodec` — the same property that made MJPEG-AVI the one
  honestly-decodable AVI (:mod:`.avicodec`).
- ``stsz``  — per-sample byte sizes (or one uniform size).
- ``stsc``  — run-length (first_chunk, samples_per_chunk) map.
- ``stco``/``co64`` — absolute file offset of each chunk; samples in a
  chunk are laid back-to-back.

So demux is pure ``struct`` walking plus a prefix-sum: expand stsc runs
to per-chunk sample counts, cumsum stsz inside each chunk starting at
its stco offset.  No timing boxes are consulted (stts only orders what
stsc/stco already order).  H.264/HEVC/VP9-in-MP4 and WebM remain honest
``NotImplementedError`` boundaries — those need real codec libraries.

``encode_mp4_mjpeg`` writes a spec-shaped fixture (ftyp + mdat + moov
with full sample tables, 2 samples per chunk so stsc/stco geometry is
non-trivial) per the public ISO/IEC 14496-12 box layout, so tests and
driver oracles exercise the same parser geometry a camera MP4 would.
"""

from __future__ import annotations

import struct

_MJPEG_FOURCC = (b"jpeg", b"mjpa", b"mjpb", b"dmb1", b"AVDJ")
_TOP_TYPES = (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide",
              b"styp", b"uuid", b"pdin", b"moof")


def is_mp4(data: bytes) -> bool:
    """True when the payload starts with a plausible ISO BMFF box — in
    practice every real MP4/MOV opens with ``ftyp`` (or QuickTime's
    ``wide``/``mdat``/``moov``)."""
    return len(data) >= 8 and data[4:8] in _TOP_TYPES


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each complete box in
    [pos, end); tolerate a truncated trailing box (stop there)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:                     # box extends to EOF
            size = end - pos
        if size < body - pos or pos + size > end:
            return                          # malformed / truncated
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, path: tuple) -> tuple:
    """Descend a container path; return (body_start, body_end) of the
    FIRST match or None.  (For trak we need all matches — see caller.)"""
    if not path:
        return (pos, end)
    for typ, b, e in _boxes(data, pos, end):
        if typ == path[0]:
            r = _find(data, b, e, path[1:])
            if r is not None:
                return r
    return None


def _fullbox(data: bytes, b: int) -> int:
    """Skip the version/flags word of a FullBox; return payload start."""
    return b + 4


def _video_sample_tables(data: bytes) -> tuple | None:
    """Locate the first MJPEG video trak and return its raw
    (stsd_fourcc, stsz, stsc, stco) box bodies."""
    moov = _find(data, 0, len(data), (b"moov",))
    if moov is None:
        return None
    for typ, tb, te in _boxes(data, *moov):
        if typ != b"trak":
            continue
        stbl = _find(data, tb, te, (b"mdia", b"minf", b"stbl"))
        if stbl is None:
            continue
        boxes = {t: (b, e) for t, b, e in _boxes(data, *stbl)}
        if b"stsd" not in boxes:
            continue
        sb, se = boxes[b"stsd"]
        p = _fullbox(data, sb) + 4          # + entry_count
        if p + 8 > se:
            continue
        fourcc = data[p + 4:p + 8]
        if fourcc not in _MJPEG_FOURCC:
            continue                        # not a track we can decode
        co = boxes.get(b"stco") or boxes.get(b"co64")
        if co is None or b"stsz" not in boxes or b"stsc" not in boxes:
            continue
        wide = b"stco" not in boxes
        return fourcc, boxes[b"stsz"], boxes[b"stsc"], co, wide
    return None


def mp4_frames(data: bytes, max_frames: int | None = None) -> list[bytes]:
    """Demux every sample of the first MJPEG video track, in sample
    order.  Raises ValueError when the payload is not MP4 or holds no
    MJPEG track (H.264 etc. — an honest codec boundary, same contract
    as :func:`.avicodec.avi_frames` for non-MJPEG AVIs)."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF (MP4/MOV) file")
    tabs = _video_sample_tables(data)
    if tabs is None:
        raise ValueError("no MJPEG video track (other codecs need "
                         "real codec libraries)")
    _, (zb, ze), (cb, ce), (ob, oe), wide = tabs

    p = _fullbox(data, zb)
    uniform, n_samples = struct.unpack(">II", data[p:p + 8])
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack(f">{n_samples}I",
                                   data[p + 8:p + 8 + 4 * n_samples]))

    p = _fullbox(data, ob)
    (n_chunks,) = struct.unpack(">I", data[p:p + 4])
    fmt, w = (">Q", 8) if wide else (">I", 4)
    offs = [struct.unpack(fmt, data[p + 4 + i * w:p + 4 + (i + 1) * w])[0]
            for i in range(n_chunks)]

    p = _fullbox(data, cb)
    (n_runs,) = struct.unpack(">I", data[p:p + 4])
    runs = [struct.unpack(">III", data[p + 4 + i * 12:p + 16 + i * 12])
            for i in range(n_runs)]        # (first_chunk, per_chunk, desc)

    # expand stsc runs to a per-chunk sample count
    per_chunk = []
    for i, (first, per, _) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        per_chunk.extend([per] * (last - first + 1))

    out: list[bytes] = []
    si = 0
    for ci, coff in enumerate(offs):
        pos = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            ln = sizes[si]
            if pos + ln > len(data):
                return out                  # truncated trailing chunk
            out.append(data[pos:pos + ln])
            pos += ln
            si += 1
            if max_frames is not None and len(out) >= max_frames:
                return out
    return out


def decode_mp4_frames(data: bytes, max_frames: int | None = None):
    """Decode every MJPEG sample to pixels (list of (h, w, 1|3) uint8)."""
    from .jpegcodec import decode_jpeg
    return [decode_jpeg(f) for f in mp4_frames(data, max_frames)]


# -- fixture encoder ----------------------------------------------------------

def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", version << 24) + body)


def encode_mp4_mjpeg(frames: list[bytes], *, width: int, height: int,
                     fps: int = 10, samples_per_chunk: int = 2,
                     faststart: bool = False) -> bytes:
    """Minimal spec-shaped MJPEG MP4: ``ftyp`` + ``mdat`` (samples packed
    ``samples_per_chunk`` per chunk) + ``moov`` with real sample tables.
    Multiple chunks + a non-trivial stsc run keep the demux geometry
    honest; a trailing short chunk exercises the run-expansion edge.
    ``faststart`` puts ``moov`` before ``mdat`` (web-style layout; stco
    offsets computed in a second pass — moov's size is offset-invariant),
    which also makes mdat truncation recoverable by the demuxer."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    spc = max(1, samples_per_chunk)
    chunks = [frames[i:i + spc] for i in range(0, n, spc)]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_off = len(ftyp) + 8               # first sample's file offset
    if faststart:                          # pass 1: moov size with dummies
        probe = _moov(frames, chunks, [0] * len(chunks), n, spc,
                      width, height, fps)
        mdat_off += len(probe)

    offs, pos = [], mdat_off
    for ch in chunks:
        offs.append(pos)
        pos += sum(len(f) for f in ch)
    moov = _moov(frames, chunks, offs, n, spc, width, height, fps)
    if faststart:
        return ftyp + moov + mdat
    return ftyp + mdat + moov


def _moov(frames, chunks, offs, n, spc, width, height, fps) -> bytes:
    dur = n * (1000 // fps or 1)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, dur)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 16
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16),
                 version=0)
    # FullBox flags: track_enabled|in_movie = 3
    tkhd = tkhd[:8] + b"\x00\x00\x00\x03" + tkhd[12:]
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, dur)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"MJPEG\x00")
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0))
    vmhd = vmhd[:8] + b"\x00\x00\x00\x01" + vmhd[12:]
    dref = _full(b"dref", struct.pack(">I", 1)
                 + _full(b"url ", b"")[:8] + b"\x00\x00\x00\x01")
    dinf = _box(b"dinf", dref)

    sample_entry = (struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
                    + struct.pack(">H", 1)            # data_ref_index
                    + b"\x00" * 16
                    + struct.pack(">HH", width, height)
                    + struct.pack(">II", 0x00480000, 0x00480000)
                    + struct.pack(">I", 0) + struct.pack(">H", 1)
                    + b"\x00" * 32
                    + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, 1000 // fps or 1))
    # two stsc runs when the trailing chunk is short
    runs = [(1, spc, 1)]
    if chunks and len(chunks[-1]) != spc:
        runs.append((len(chunks), len(chunks[-1]), 1))
    stsc = _full(b"stsc", struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">III", *r) for r in runs))
    stsz = _full(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", struct.pack(">I", len(offs))
                 + b"".join(struct.pack(">I", o) for o in offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    return _box(b"moov", mvhd + trak)
