"""GIF87a/89a codec in pure numpy + stdlib (no PIL/libgif in the container).

The reference has no media path; this closes the GIF half of the builder
brief's multimodal requirement (JPEG landed as `jpegcodec.py`; WebP stays
an honest NotImplementedError — VP8 entropy coding is out of scope for a
stdlib codec).  Real Common-Crawl image columns carry GIFs, so the decode
path here is REAL, not a stub:

- ``decode_gif``: first frame as (h, w, 3) uint8 RGB on the logical-screen
  canvas.  Handles global AND local color tables, interlaced images
  (the 8/8/4/2 four-pass row order), transparency (GCE transparent index
  pixels leave the canvas untouched), restartable LZW (CLEAR codes,
  deferred clear at a full 4096-entry table) and variable code width.
- ``decode_gif_frames``: every frame composited in order — disposal
  method 2 restores the frame rect to the background color, 0/1/3 leave
  the canvas (method 3 "restore to previous" is approximated as leave,
  documented: fixtures never use it).  This makes an ANIMATED GIF a real
  multi-frame clip container for ``FrameSampleStage``, alongside the
  concatenated-PNG container.
- ``encode_gif``: fixture writer with REAL LZW compression (prefix-dict,
  table reset at 4096), optional interlace, multi-frame animations with
  per-frame GCE delay + optional transparency index.  Palette is built
  from the frames' unique colors (≤256 enforced — fixture writers control
  their colors), so encode→decode round-trips are BYTE-EXACT on pixels.

Entropy decode walks codes in a Python loop (LZW is inherently
sequential, same boundary as the JPEG Huffman loop); expansion writes
into a preallocated uint8 buffer via a prefix/suffix/length table, so
per-code work is O(expanded bytes), not O(table depth × strings).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in the order an interlaced GIF stores them."""
    return np.concatenate([np.arange(s, h, step, dtype=np.int64)
                           for s, step in _INTERLACE_PASSES if s < h])


# -- LZW (GIF variant: LSB-first packing, variable 3..12-bit codes) ------------


def _lzw_decode(data: bytes, mcs: int, npix: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) to ``npix`` palette
    indices.  ``mcs`` = LZW minimum code size from the image block."""
    clear = 1 << mcs
    eoi = clear + 1
    # prefix chain tables: expanding code c appends suffix[c] after the
    # expansion of prefix[c]; length[c] lets us write back-to-front into a
    # preallocated output slice; first[c] = first byte of the expansion
    # (needed for the KwKwK case without expanding twice)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    first = np.zeros(4096, dtype=np.uint8)
    base = np.arange(clear, dtype=np.uint8)
    suffix[:clear] = base
    first[:clear] = base
    length[:clear] = 1

    out = np.zeros(npix, dtype=np.uint8)
    out_pos = 0
    width = mcs + 1
    next_code = eoi + 1
    prev = -1
    acc = 0
    nbits = 0
    bytepos = 0
    nbytes = len(data)

    def _emit(code: int) -> int:
        """Write the expansion of ``code`` at out_pos; return new out_pos."""
        lc = int(length[code])
        end = min(out_pos + lc, npix)
        i = out_pos + lc - 1
        c = code
        while c >= 0:
            if i < npix:
                out[i] = suffix[c]
            c = int(prefix[c])
            i -= 1
        return end

    while out_pos < npix:
        while nbits < width:
            if bytepos >= nbytes:
                return out          # truncated stream: partial decode
            acc |= data[bytepos] << nbits
            bytepos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            next_code = eoi + 1
            width = mcs + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            out_pos = _emit(code)
            prev = code
            continue
        if code < next_code:                      # known code
            out_pos = _emit(code)
            k = first[code]
        elif code == next_code:                   # KwKwK
            k = first[prev]
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        if next_code < 4096:                      # deferred clear when full
            prefix[next_code] = prev
            suffix[next_code] = k
            first[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            if code == next_code:                 # emit the JUST-added entry
                out_pos = _emit(next_code)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        elif code == next_code:
            raise ValueError("corrupt GIF LZW stream (KwKwK at full table)")
        prev = code
    return out


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW encoder mirroring ``_lzw_decode``'s width schedule."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    width = mcs + 1
    next_code = eoi + 1
    put(clear, width)
    cur = -1
    for k in indices.astype(np.int64).tolist():
        if cur < 0:
            cur = k
            continue
        e = table.get((cur, k))
        if e is not None:
            cur = e
            continue
        put(cur, width)
        if next_code < 4096:
            table[(cur, k)] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # the decoder inserts one code LATER than we do (it can't
                # build an entry until it has read the code after it), so
                # its width bump lands one insert after ours: bump at
                # 2^width + 1, not 2^width, to stay in lockstep
                width += 1
        else:
            put(clear, width)
            table.clear()
            width = mcs + 1
            next_code = eoi + 1
        cur = k
    if cur >= 0:
        put(cur, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container parsing ----------------------------------------------------------


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at pos; return (bytes, next)."""
    parts = []
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            break
        parts.append(data[pos:pos + n])
        pos += n
    return b"".join(parts), pos


def _iter_frames(data: bytes):
    """Yield (canvas_w, canvas_h, bg_rgb, frame dicts) walking the stream."""
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (2 << (flags & 0x07))
        gct = np.frombuffer(data[pos:pos + n], dtype=np.uint8).reshape(-1, 3)
        pos += n
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    gce_transparent = -1
    gce_disposal = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:                         # trailer
            break
        if b0 == 0x21:                         # extension
            label = data[pos]
            pos += 1
            body, pos = _subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:   # graphic control
                gce_disposal = (body[0] >> 2) & 0x07
                gce_transparent = body[3] if body[0] & 0x01 else -1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:                      # local color table
            n = 3 * (2 << (iflags & 0x07))
            pal = np.frombuffer(data[pos:pos + n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += n
        if pal is None:
            raise ValueError("GIF image block with no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:                      # interlaced: reorder rows
            dst = np.empty_like(idx)
            dst[_interlace_order(fh)] = idx
            idx = dst
        yield {"canvas": (w, h), "bg": bg_rgb, "left": left, "top": top,
               "idx": idx, "pal": pal, "transparent": gce_transparent,
               "disposal": gce_disposal}
        gce_transparent = -1
        gce_disposal = 0


def decode_gif_frames(data: bytes, max_frames: int | None = None
                      ) -> list[np.ndarray]:
    """All frames composited in stream order → list of (h, w, 3) uint8."""
    frames: list[np.ndarray] = []
    canvas = None
    for fr in _iter_frames(data):
        w, h = fr["canvas"]
        if canvas is None:
            canvas = np.broadcast_to(fr["bg"], (h, w, 3)).copy()
        idx, pal = fr["idx"], fr["pal"]
        fh, fw = idx.shape
        t, l = fr["top"], fr["left"]
        region = canvas[t:t + fh, l:l + fw]
        px = pal[np.minimum(idx, len(pal) - 1)]
        if fr["transparent"] >= 0:
            m = (idx != fr["transparent"])[:region.shape[0], :region.shape[1]]
            region[m] = px[:region.shape[0], :region.shape[1]][m]
        else:
            region[:] = px[:region.shape[0], :region.shape[1]]
        frames.append(canvas.copy())
        if fr["disposal"] == 2:                # restore rect to background
            canvas[t:t + fh, l:l + fw] = fr["bg"]
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First frame on the logical-screen canvas → (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data, max_frames=1)[0]


# -- fixture encoder -------------------------------------------------------------


def encode_gif(frames, *, interlace: bool = False, delay_cs: int = 4,
               transparent_rgb=None) -> bytes:
    """GIF89a fixture writer with real LZW compression.

    ``frames``: one (h, w, 3|1) uint8 array or a list of same-shape arrays
    (≥2 frames writes an animation with per-frame GCE delays).  All unique
    colors across frames must fit one ≤256-entry global palette (fixture
    writers control their colors; raises ValueError otherwise).
    ``transparent_rgb``: exact color rendered transparent via the GCE
    index (animation fixtures for the disposal/compositing path)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    norm = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.repeat(f[:, :, None], 3, axis=2)
        norm.append(f[:, :, :3])
    h, w = norm[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in norm):
        raise ValueError("all fixture frames must share one shape")

    flat = np.concatenate([f.reshape(-1, 3) for f in norm])
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if transparent_rgb is not None:
        trgb = np.asarray(transparent_rgb, np.uint8)
        if not (pal == trgb).all(axis=1).any():
            pal = np.concatenate([pal, trgb[None, :]])
    if len(pal) > 256:
        raise ValueError(f"fixture needs {len(pal)} colors (>256)")
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal_full[:len(pal)] = pal
    tindex = (int(np.flatnonzero((pal == np.asarray(transparent_rgb,
                                                    np.uint8)).all(axis=1))[0])
              if transparent_rgb is not None else -1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal_full.tobytes()
    mcs = max(2, bits)
    per_frame = np.split(inv.astype(np.int64), len(norm))
    for fi, (f, fidx) in enumerate(zip(norm, per_frame)):
        if len(norm) > 1 or tindex >= 0:
            gce_flags = 0x01 if tindex >= 0 else 0x00
            out += bytes([0x21, 0xF9, 4, gce_flags]) \
                + struct.pack("<H", delay_cs) \
                + bytes([tindex if tindex >= 0 else 0, 0])
        iflags = 0x40 if interlace else 0x00
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = fidx.reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            blk = lzw[i:i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
