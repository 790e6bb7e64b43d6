"""Codec tests for the real=True decode seam (operators/imagecodec.py).

Fixtures are generated in-test: a minimal PNG encoder (spec-direct:
zlib + filters + CRC chunks) exercises the PNG decoder across color
types and all five filters; JPEGs are hand-assembled baseline streams
(DQT/SOF0/DHT/SOS + entropy bits) whose expected pixel values follow
in closed form from the DCT definition, so a decode bug cannot hide
behind an encoder bug.
"""

import struct
import zlib

import numpy as np
import pytest

from dataflowtemplates_spark.operators.imagecodec import (
    decode,
    decode_jpeg,
    decode_png,
    decode_wav,
    sniff_format,
)

# ---------------------------------------------------------------------------
# PNG fixture encoder
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def encode_png(px: np.ndarray, color: int, filters=None,
               plte: np.ndarray | None = None) -> bytes:
    """Spec-direct PNG encoder for fixtures. ``px``: HxWxC uint8 (C per
    color type), ``filters``: per-row filter type (default all 0)."""
    h, w, ch = px.shape
    bpp = ch
    filters = filters or [0] * h
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int64)
        f = filters[y]
        raw.append(f)
        for x in range(w * bpp):
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - left
            elif f == 2:
                v = row[x] - up
            elif f == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                v = row[x] - _paeth(int(left), int(up), int(ul))
            raw.append(int(v) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [
    [0, 0, 0, 0], [1, 1, 1, 1], [0, 2, 2, 2], [3, 3, 3, 3],
    [4, 4, 4, 4], [0, 1, 2, 3],
])
def test_png_rgb_all_filters(filters):
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    got = decode_png(encode_png(px, color=2, filters=filters))
    np.testing.assert_array_equal(got, px)


def test_png_grayscale_replicates_channels():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    got = decode_png(encode_png(px, color=0, filters=[0, 1, 2]))
    assert got.shape == (3, 4, 3)
    np.testing.assert_array_equal(got[..., 0], px[..., 0])
    np.testing.assert_array_equal(got[..., 1], px[..., 0])


def test_png_rgba_drops_alpha():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(2, 3, 4), dtype=np.uint8)
    got = decode_png(encode_png(px, color=6, filters=[4, 4]))
    np.testing.assert_array_equal(got, px[..., :3])


def test_png_palette_resolves():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                    dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[..., None]
    got = decode_png(encode_png(idx, color=3, plte=plte))
    np.testing.assert_array_equal(got, plte[idx[..., 0]])


def test_png_interlace_rejected():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(encode_png(px, color=2))
    # flip the IHDR interlace byte (last byte of the 13-byte IHDR body)
    # and fix up the chunk CRC
    ihdr_body = bytearray(data[16:29])
    ihdr_body[-1] = 1
    data[16:29] = ihdr_body
    data[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(ihdr_body)))
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(data))


# ---------------------------------------------------------------------------
# JPEG fixtures: hand-assembled baseline streams
# ---------------------------------------------------------------------------

#: a tiny complete Huffman spec used for every table in the fixtures:
#: symbols 0x00..0x0B at lengths 2,3,...  (canonical assignment)
_COUNTS = [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0]
_SYMBOLS = bytes(range(12))


def _huff_bits():
    """symbol -> (code, length) for the fixture table."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(_COUNTS[length - 1]):
            out[_SYMBOLS[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out).replace(b"\xff", b"\xff\x00")  # byte stuffing


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tid: int, flat_value: int) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes([flat_value] * 64))


def _dht(tc: int, th: int) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(_COUNTS) + _SYMBOLS)


def _category(v: int) -> tuple[int, int, int]:
    """value -> (category, bits, nbits) per JPEG magnitude coding."""
    if v == 0:
        return 0, 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits, t


def _encode_dc_only_block(w: _BitWriter, hb: dict, dc_diff: int):
    t, bits, n = _category(dc_diff)
    code, length = hb[t]
    w.write(code, length)
    if n:
        w.write(bits, n)
    code, length = hb[0x00]      # AC EOB
    w.write(code, length)


def make_gray_jpeg(dc_values: list[int], blocks_x: int, q: int = 1) -> bytes:
    """Grayscale baseline JPEG of 8x(8*blocks_x), each 8x8 block a flat
    field: pixel = clip(round(dc * q / 8) + 128). DC-only, EOB ACs."""
    hb = _huff_bits()
    w = _BitWriter()
    pred = 0
    for dc in dc_values:
        _encode_dc_only_block(w, hb, dc - pred)
        pred = dc
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8 * blocks_x, 1)
               + bytes([1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00]) + bytes([0, 63, 0]))
    return (b"\xff\xd8" + _dqt(0, q) + _dht(0, 0) + _dht(1, 0)
            + sof + sos + w.tobytes() + b"\xff\xd9")


def test_jpeg_dc_only_flat_block():
    # DC coefficient 40, flat quant 2: IDCT of a DC-only block is the
    # constant dc*q/8 (orthonormal: DC basis is 1/sqrt(8) per axis),
    # so pixel = 40*2/8 + 128 = 138 everywhere
    img = decode_jpeg(make_gray_jpeg([40], blocks_x=1, q=2))
    assert img.shape == (8, 8, 3)
    assert np.all(img == 138)


def test_jpeg_dc_prediction_across_blocks():
    # successive DC values are DIFF-coded; three blocks at distinct
    # levels verify the predictor chain (and a negative diff)
    img = decode_jpeg(make_gray_jpeg([40, 80, 16], blocks_x=3, q=2))
    assert img.shape == (8, 24, 3)
    assert np.all(img[:, 0:8] == 138)    # 40*2/8+128
    assert np.all(img[:, 8:16] == 148)   # 80*2/8+128
    assert np.all(img[:, 16:24] == 132)  # 16*2/8+128


def test_jpeg_color_ycbcr():
    """3-component 4:4:4 DC-only JPEG: flat YCbCr -> known RGB."""
    hb = _huff_bits()
    w = _BitWriter()
    for dc in (64, -32, 48):   # Y=144, Cb=120, Cr=140 (q=2: dc*2/8+128)
        _encode_dc_only_block(w, hb, dc)
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 3)
               + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
               + bytes([3, 0x11, 0]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00])
               + bytes([0, 63, 0]))
    data = (b"\xff\xd8" + _dqt(0, 2) + _dht(0, 0) + _dht(1, 0)
            + sof + sos + w.tobytes() + b"\xff\xd9")
    img = decode_jpeg(data)
    y, cb, cr = 144.0, 120.0, 140.0
    want = np.round([y + 1.402 * (cr - 128),
                     y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                     y + 1.772 * (cb - 128)])
    assert img.shape == (8, 8, 3)
    np.testing.assert_array_equal(img[0, 0], want.astype(np.uint8))
    assert np.all(img == img[0, 0])


def test_jpeg_ac_coefficient_roundtrip():
    """One AC coefficient: pixel field must equal the IDCT in closed
    form (cosine ramp), within rounding."""
    hb = _huff_bits()
    w = _BitWriter()
    _encode_dc_only_block_with_ac(w, hb, dc=0, ac1=100)
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00]) + bytes([0, 63, 0]))
    data = (b"\xff\xd8" + _dqt(0, 1) + _dht(0, 0) + _dht(1, 0)
            + sof + sos + w.tobytes() + b"\xff\xd9")
    img = decode_jpeg(data).astype(np.float64)
    # zigzag index 1 = (u=0, v=1): horizontal cosine, constant in y
    x = np.arange(8)
    want = (100.0 * np.sqrt(2) / 8.0
            * np.cos((2 * x + 1) * np.pi / 16)) + 128.0
    want = np.clip(np.round(want), 0, 255)
    np.testing.assert_allclose(img[0, :, 0], want, atol=1)
    np.testing.assert_array_equal(img[0, :, 0], img[7, :, 0])


def _encode_dc_only_block_with_ac(w, hb, dc: int, ac1: int):
    t, bits, n = _category(dc)
    code, length = hb[t]
    w.write(code, length)
    if n:
        w.write(bits, n)
    t, bits, n = _category(ac1)
    code, length = hb[t]       # run=0 in high nibble, size=t
    w.write(code, length)
    w.write(bits, n)
    code, length = hb[0x00]
    w.write(code, length)


def test_jpeg_420_subsampled_quadrants():
    """4:2:0: one MCU = four Y blocks + one Cb + one Cr. Distinct Y
    DCs produce four flat 8x8 luma quadrants; neutral chroma (DC 0 ->
    128) makes RGB == luma, so the quadrant map checks both the MCU
    block order and the 2x2 chroma upsampling."""
    hb = _huff_bits()
    w = _BitWriter()
    pred = 0
    for dc in (0, 40, 80, 120):          # Y quadrants: 128,138,148,158
        _encode_dc_only_block(w, hb, dc - pred)
        pred = dc
    _encode_dc_only_block(w, hb, 0)      # Cb = 128
    _encode_dc_only_block(w, hb, 0)      # Cr = 128
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
               + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
               + bytes([3, 0x11, 0]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00])
               + bytes([0, 63, 0]))
    data = (b"\xff\xd8" + _dqt(0, 2) + _dht(0, 0) + _dht(1, 0)
            + sof + sos + w.tobytes() + b"\xff\xd9")
    img = decode_jpeg(data)
    assert img.shape == (16, 16, 3)
    assert np.all(img[:8, :8] == 128)     # Y block (0,0), dc 0
    assert np.all(img[:8, 8:] == 138)     # Y block (0,1), dc 40
    assert np.all(img[8:, :8] == 148)     # Y block (1,0), dc 80
    assert np.all(img[8:, 8:] == 158)     # Y block (1,1), dc 120


def test_jpeg_restart_markers_reset_dc_prediction():
    """DRI=1: an RST marker lands between the two MCUs; the entropy
    stream re-byte-aligns and the DC predictor resets, so the second
    block's DC is ABSOLUTE, not a diff."""
    hb = _huff_bits()
    w1 = _BitWriter()
    _encode_dc_only_block(w1, hb, 40)   # block 1: DC 40 -> pixel 138
    w2 = _BitWriter()
    _encode_dc_only_block(w2, hb, 16)   # block 2: DC 16 absolute -> 132
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00]) + bytes([0, 63, 0]))
    dri = _seg(0xDD, struct.pack(">H", 1))
    data = (b"\xff\xd8" + _dqt(0, 2) + _dht(0, 0) + _dht(1, 0) + dri
            + sof + sos + w1.tobytes() + b"\xff\xd0" + w2.tobytes()
            + b"\xff\xd9")
    img = decode_jpeg(data)
    assert img.shape == (8, 16, 3)
    assert np.all(img[:, :8] == 138)
    assert np.all(img[:, 8:] == 132)


def test_jpeg_progressive_rejected():
    data = (b"\xff\xd8"
            + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1)
                   + bytes([1, 0x11, 0])))
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(data)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def make_wav(samples: np.ndarray, rate: int, bits: int = 16,
             channels: int = 1, fmt: int = 1) -> bytes:
    if bits == 16:
        raw = (samples * 32768.0).clip(-32768, 32767) \
            .astype("<i2").tobytes()
    elif bits == 8:
        raw = ((samples * 128.0) + 128).clip(0, 255) \
            .astype(np.uint8).tobytes()
    else:
        raw = samples.astype("<f4").tobytes()
    block = channels * bits // 8
    fmtc = struct.pack("<HHIIHH", fmt, channels, rate,
                       rate * block, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm16_roundtrip():
    x = np.sin(np.linspace(0, 2 * np.pi, 64)).astype(np.float32) * 0.5
    wave, rate = decode_wav(make_wav(x, 16000, bits=16))
    assert rate == 16000
    np.testing.assert_allclose(wave, x, atol=1 / 32768)


def test_wav_float32_and_stereo_mono_mix():
    x = np.array([0.5, -0.5, 0.25, -0.25], dtype=np.float32)
    wave, rate = decode_wav(
        make_wav(x, 8000, bits=32, channels=2, fmt=3))
    assert rate == 8000
    np.testing.assert_allclose(wave, [0.0, 0.0], atol=1e-7)


def test_wav_nonpcm_rejected():
    x = np.zeros(4, dtype=np.float32)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_wav(make_wav(x, 8000, bits=16, fmt=85))  # mp3 tag


# ---------------------------------------------------------------------------
# dispatch + seam
# ---------------------------------------------------------------------------

def test_sniff_and_dispatch():
    png = encode_png(np.zeros((1, 1, 3), dtype=np.uint8), color=2)
    jpg = make_gray_jpeg([0], blocks_x=1)
    assert sniff_format(png) == "png"
    assert sniff_format(jpg) == "jpeg"
    assert sniff_format(b"RIFF....WAVE") == "wav"
    assert sniff_format(b"\x00\x01\x02\x03") is None
    assert decode(png).shape == (1, 1, 3)
    assert decode(jpg).shape == (8, 8, 3)
    with pytest.raises(ValueError, match="unrecognized"):
        decode(b"not an image at all")


def test_decode_image_real_seam():
    """real=True on the multimodal operator now decodes actual
    payloads (the r8 grade gap); the stub path is untouched."""
    from dataflowtemplates_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )
    png = encode_png(np.full((2, 2, 3), 7, dtype=np.uint8), color=2)
    out = decode_image(png, 999, 999, real=True)   # dims from the file
    assert out.shape == (2, 2, 3) and np.all(out == 7)
    x = np.array([0.25, -0.25], dtype=np.float32)
    wave = decode_audio(make_wav(x, 22050, bits=16), 0, real=True)
    np.testing.assert_allclose(wave, x, atol=1 / 32768)
    # stub path: unchanged contract (tiling, deterministic)
    stub = decode_image(b"\x01\x02", 4, 4)
    assert stub.shape == (4, 4, 3) and stub[0, 0, 0] == 1


def test_png_roundtrip_property():
    """Property: encode_png(decode) is the identity for arbitrary RGB
    arrays (the product encoder against the product decoder)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflowtemplates_spark.operators.imagecodec import (
        encode_png as product_encode,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
    def roundtrip(h, w, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(product_encode(px)), px)

    roundtrip()
