"""Pure-Python media codecs for the ``real=True`` decode seam.

The multimodal operators (operators/multimodal.py) keep media as opaque
binary columns and decode only inside Arrow-batched stages. This module
makes the ``real=True`` path of that seam actually decode the three
formats a corpus most commonly carries, with nothing beyond the
stdlib + numpy (no PIL/libjpeg/libsndfile in this environment):

* **PNG** — full baseline support: zlib inflate, all five scanline
  filters, color types 0/2/3/4/6, 8- and 16-bit depth (16 truncates to
  the high byte). Adam7 interlace is rejected explicitly.
* **JPEG** — baseline sequential DCT (SOF0/SOF1): DQT/DHT/DRI/SOS
  parsing, Huffman entropy decode, dequantize + 2-D IDCT (numpy
  matrix form), chroma upsampling for any sampling factors, JFIF
  YCbCr→RGB. Progressive (SOF2) and arithmetic coding are rejected
  explicitly.
* **WAV** — RIFF PCM (8/16/24/32-bit int and 32-bit float) to a
  float32 waveform in [-1, 1); non-PCM codecs are rejected.

Throughput note: the entropy decode is Python-loop-bound (the DCT and
color math are vectorized), so this codec is the CORRECTNESS tier —
good for fixtures, validation sampling, and modest images. At 100 TB
you put a C-backed codec (PIL/turbojpeg) behind the same two functions;
every Spark-side contract (schema, batching, dispatch) is unchanged.

Reference parity: mercari/DataflowTemplates has no media handling —
this is part of the first-class multimodal extension (SURVEY.md §7.2).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["sniff_format", "decode", "decode_png", "decode_jpeg",
           "decode_wav", "encode_png"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str | None:
    """'png' | 'jpeg' | 'wav' | None by magic bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def decode(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> HxWx3 uint8 (images)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise ValueError(
        f"unrecognized image payload (magic {data[:4]!r}); "
        "supported: PNG, baseline JPEG")


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

#: channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 (alpha dropped, grayscale replicated,
    palette resolved)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, n = 8, len(data)
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    ch = _PNG_CHANNELS[color]
    bpp = ch * (depth // 8)          # filter unit: bytes per pixel
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")

    # Filter reconstruction. None/Sub/Up vectorize whole-row in numpy;
    # Average/Paeth carry a loop dependency on the LEFT neighbor (the
    # value being reconstructed) through a non-linear predictor
    # (floor-average / min-of-abs select), so no prefix-scan or other
    # closed-form numpy expression exists — for those rows the loop
    # runs over plain Python ints (bytes indexing + list cells), which
    # beats per-element numpy scalar indexing by an order of
    # magnitude. MEASURED CEILING (r13, worst case = EVERY row
    # filtered, 512x512 RGB, min-of-3): Paeth 3.1 MB/s, Average
    # 6.0 MB/s per task; None/Sub/Up rows decode at numpy speed, so
    # real encoder output (per-row filter selection) lands well above
    # the worst case, and tasks parallelize per image across
    # executors. This is the accepted pure-CPython ceiling: the 100 TB
    # decode path is the declared stub seam (SURVEY §2 multimodal) —
    # production swaps in a native codec (PIL/libpng) behind the same
    # mapInPandas batch shape, which these bytes-level tests pin.
    out = np.zeros((h, stride), dtype=np.uint8)
    prior_np = np.zeros(stride, dtype=np.int64)   # always current
    prior_list: list[int] | None = None           # lazy twin
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        if ftype in (0, 1, 2):
            row = np.frombuffer(raw, dtype=np.uint8,
                                count=stride, offset=off + 1)
            if ftype == 0:                   # None
                recon_np = row.astype(np.int64)
            elif ftype == 1:                 # Sub: prefix sum per lane
                recon_np = (np.cumsum(
                    row.reshape(-1, bpp).astype(np.int64), axis=0)
                    .reshape(-1)) & 0xFF
            else:                            # Up
                recon_np = (row + prior_np) & 0xFF
            out[y] = recon_np
            prior_np, prior_list = recon_np, None
        elif ftype in (3, 4):
            p = (prior_list if prior_list is not None
                 else prior_np.tolist())
            recon = list(raw[off + 1:off + 1 + stride])
            if ftype == 3:                   # Average
                for x in range(bpp):
                    recon[x] = (recon[x] + (p[x] >> 1)) & 0xFF
                for x in range(bpp, stride):
                    recon[x] = (recon[x]
                                + ((recon[x - bpp] + p[x]) >> 1)) & 0xFF
            else:                            # Paeth
                # first bpp bytes: a = c = 0 -> predictor is always b
                for x in range(bpp):
                    recon[x] = (recon[x] + p[x]) & 0xFF
                for x in range(bpp, stride):
                    a = recon[x - bpp]
                    b = p[x]
                    c = p[x - bpp]
                    pa = b - c
                    if pa < 0:
                        pa = -pa
                    pb = a - c
                    if pb < 0:
                        pb = -pb
                    pc = a + b - c - c
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    recon[x] = (recon[x] + pred) & 0xFF
            out[y] = recon
            prior_np = np.asarray(recon, dtype=np.int64)
            prior_list = recon
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")

    px = out.reshape(h, w, ch * (depth // 8))
    if depth == 16:
        px = px.reshape(h, w, ch, 2)[..., 0]  # high byte
    else:
        px = px.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[..., 0]]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    if color == 6:
        return np.ascontiguousarray(px[..., :3])
    return np.ascontiguousarray(px)


def encode_png(px: np.ndarray) -> bytes:
    """HxWx3 uint8 -> PNG bytes (color type 2, filter 0, zlib-9).

    The write-side twin of :func:`decode_png` — enough to materialize real
    image payloads from array data (normalization pipelines, fixtures,
    the q123 round-trip gate). Filter 0 everywhere: compression is
    zlib's job here; filter search is a size optimization a C encoder
    owns at scale.
    """
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w, _ = px.shape
    # one allocation: filter-byte column prepended to each scanline
    raw = np.hstack([np.zeros((h, 1), dtype=np.uint8),
                     px.reshape(h, w * 3)]).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.intp)

#: orthonormal 8-point DCT-II basis: _DCT_C[u, x]
_DCT_C = np.array([[
    (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
    * np.cos((2 * x + 1) * u * np.pi / 16)
    for x in range(8)] for u in range(8)])


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data (0xFF00
    stuffing removed by the caller per-segment)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """JPEG magnitude-category decode (ITU T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """(length, code) -> symbol, canonical JPEG code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWx3 uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(data)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> table
    restart_interval = 0
    frame = None                             # (h, w, comps)
    out = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                   # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen

        if marker == 0xDB:                   # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2",
                                         count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8,
                                         count=64, offset=i)
                    i += 64
                table = np.zeros(64, dtype=np.int32)
                table[_ZIGZAG] = vals.astype(np.int32)
                qt[tq] = table.reshape(8, 8)
        elif marker in (0xC0, 0xC1):         # SOF0/SOF1 baseline
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported — baseline only")
        elif marker in (0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "arithmetic-coded JPEG not supported")
        elif marker == 0xC4:                 # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1:i + 17])
                nsym = sum(counts)
                symbols = body[i + 17:i + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + nsym
        elif marker == 0xDD:                 # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                 # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            # entropy-coded data: up to the next non-RST marker
            start = pos
            segments = []
            seg_start = pos
            while pos + 1 < n:
                if data[pos] == 0xFF and data[pos + 1] not in (0x00,):
                    m2 = data[pos + 1]
                    if 0xD0 <= m2 <= 0xD7:   # RSTn: segment boundary
                        segments.append(data[seg_start:pos])
                        pos += 2
                        seg_start = pos
                        continue
                    break
                pos += 1
            segments.append(data[seg_start:pos])
            out = _decode_scan(frame, scan, segments, qt, huff,
                               restart_interval)
        # all other segments (APPn, COM) are skipped

    if out is None:
        raise ValueError("JPEG contained no scan")
    return out


def _decode_scan(frame, scan, segments, qt, huff, restart_interval):
    fh, fw, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)

    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                          dtype=np.float64)
        for c in comps}
    pred = {c["id"]: 0 for c in comps}

    # Entropy decode collects every block's 64 zigzag coefficients as a
    # plain Python list (per-element numpy writes are an order of
    # magnitude slower than list cells); the dequantize + IDCT then
    # runs ONE batched einsum over all blocks of each component instead
    # of two 8x8 matmuls per block — the vectorization the per-block
    # loop was leaving on the table.
    coef_lists: dict[int, list[list[int]]] = {c["id"]: [] for c in comps}
    block_pos: dict[int, list[tuple[int, int]]] = {c["id"]: [] for c in comps}
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                # RST boundary: new byte-aligned segment, predictors reset
                reader = _BitReader(
                    next(seg_iter).replace(b"\xff\x00", b"\xff"))
                pred = {c["id"]: 0 for c in comps}
            mcu_index += 1
            for cid, dc_id, ac_id in scan:
                comp = by_id[cid]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coefs = [0] * 64
                        t = _huff_decode(reader, huff[(0, dc_id)])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        coefs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, ac_id)])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:      # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef_lists[cid].append(coefs)
                        block_pos[cid].append(
                            ((my * comp["v"] + by) * 8,
                             (mx * comp["h"] + bx) * 8))

    for c in comps:
        cid = c["id"]
        if not coef_lists[cid]:
            continue
        zz = np.asarray(coef_lists[cid], dtype=np.float64)   # (n, 64)
        blocks = np.zeros_like(zz)
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        # pixels[n] = C.T @ block[n] @ C, batched
        pixels = np.einsum("xu,nuv,vy->nxy", _DCT_C.T, blocks,
                           _DCT_C, optimize=True) + 128.0
        plane = planes[cid]
        for i, (py, px) in enumerate(block_pos[cid]):
            plane[py:py + 8, px:px + 8] = pixels[i]

    # upsample each component plane to full frame resolution
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:fh, :fw])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError(
            f"{len(full)}-component JPEG not supported (expect 1 or 3)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (float32 waveform in [-1, 1), sample_rate).

    Multi-channel audio is averaged to mono (the corpus-stats shape the
    multimodal operators consume); int PCM normalizes by full scale.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)         # chunks are 2-byte aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byterate, _align, bits = fmt
    if audio_fmt == 1:                       # integer PCM
        if bits == 8:                        # unsigned
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            v = (b3[:, 0].astype(np.int32)
                 | (b3[:, 1].astype(np.int32) << 8)
                 | (b3[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = (np.frombuffer(raw, dtype="<i4").astype(np.float32)
                 / 2147483648.0)
        else:
            raise NotImplementedError(f"{bits}-bit PCM not supported")
    elif audio_fmt == 3 and bits == 32:      # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(
            f"WAV codec {audio_fmt} not supported (PCM only)")
    if channels > 1:
        x = x[:len(x) - len(x) % channels]
        x = x.reshape(-1, channels).mean(axis=1)
    return x.astype(np.float32), rate
