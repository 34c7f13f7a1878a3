"""Property-based tests (hypothesis) for the pure-Python kernels —
driver-side only, no Spark session, so hundreds of examples are cheap.

Covers the invariants unit examples can miss: PNG round-trips for
arbitrary pixel content / dims / color types / filter mixes, WAV PCM
round-trips, BMP stride/row-order handling, the FastSS blocking
guarantee (distance<=1 implies a shared deletion variant), and
Misra-Gries candidate-superset behavior."""

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fluss_datafusion_spark.functions import multimodal as mm


def _png_chunk(ctype, data):
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_block(px, filters, bps):
    """Filter one scanline block (whole image or one Adam7 pass) into
    raw pre-compression bytes — the spec's byte-level filters with the
    pixel width = channels*bps bytes."""
    h, w, c = px.shape
    bpp = c * bps

    def line_bytes(row):
        if bps == 1:
            return row.reshape(-1).astype(np.int16)
        return np.frombuffer(
            row.reshape(-1).astype(">u2").tobytes(), np.uint8
        ).astype(np.int16)

    prev = np.zeros(w * bpp, np.int16)
    raw = bytearray()
    for y in range(h):
        line = line_bytes(px[y])
        ftype = filters[y % len(filters)]
        raw.append(ftype)
        for x in range(w * bpp):
            left = int(line[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            raw.append((int(line[x]) - pred) & 0xFF)
        prev = line
    return bytes(raw)


def _png_encode(px, color_type, filters, depth=8):
    h, w, c = px.shape
    raw = _png_filter_block(px, filters, depth // 8)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )


def _png_encode_adam7(px, color_type, filters, depth=8):
    h, w, c = px.shape
    raw = bytearray()
    for x0, y0, dx, dy in mm._ADAM7:
        sub = px[y0::dy, x0::dx, :]
        if sub.shape[0] and sub.shape[1]:
            raw += _png_filter_block(sub, filters, depth // 8)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    color=st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, color, filters, seed):
    color_type, channels = color
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    got = mm.decode_png_pixels(_png_encode(px, color_type, filters))
    assert got is not None and np.array_equal(got, px)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    color=st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
)
def test_png16_roundtrip_property(w, h, color, filters, seed):
    """16-bit depth (r6): big-endian byte-pair samples, filters on
    bytes with a 2x pixel width — bit-exact through all five filter
    types and every color type."""
    color_type, channels = color
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 65536, size=(h, w, channels), dtype=np.uint16)
    got = mm.decode_png_pixels(_png_encode(px, color_type, filters, depth=16))
    assert got is not None and got.dtype == np.uint16
    assert np.array_equal(got, px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    depth=st.sampled_from([8, 16]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_roundtrip_property(w, h, depth, filters, seed):
    """Adam7 interlace at both depths: seven independently-filtered
    passes (ragged/empty passes included) scatter back bit-exactly."""
    rng = np.random.default_rng(seed)
    if depth == 8:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    else:
        px = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
    got = mm.decode_png_pixels(_png_encode_adam7(px, 2, filters, depth=depth))
    assert got is not None and np.array_equal(got, px)


@settings(max_examples=60, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    n_frames=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_pcm_roundtrip_property(rate, channels, n_frames, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n_frames, channels)).astype("<i2")
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data = samples.tobytes()
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert mm.parse_wav_header(wav) == (rate, channels, 16, n_frames)
    got = mm.decode_wav_pcm(wav)
    assert got is not None and np.array_equal(got, samples)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 8),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, top_down, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = (w * 3 + 3) & ~3
    rows = []
    row_order = range(h) if top_down else range(h - 1, -1, -1)
    for y in row_order:
        bgr = px[y][:, ::-1].reshape(-1).tobytes()
        rows.append(bgr + b"\x00" * (stride - 3 * w))
    data = b"".join(rows)
    header = (b"BM" + struct.pack("<I", 54 + len(data)) + b"\x00" * 4
              + struct.pack("<I", 54))
    info = struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 24,
                       0, len(data), 2835, 2835, 0, 0)
    got = mm.decode_bmp_pixels(header + info + data)
    assert got is not None and np.array_equal(got, px)


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _deletion_set(s: str):
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(alphabet="abcde", min_size=0, max_size=10),
    op=st.sampled_from(["sub", "ins", "del", "none"]),
    pos=st.integers(0, 10),
    ch=st.sampled_from("abcde"),
)
def test_fastss_blocking_guarantee_property(s, op, pos, ch):
    """Any pair at levenshtein distance <= 1 MUST share a deletion
    variant — the recall-1.0 claim fuzzy_join_pairs rests on."""
    if op == "sub" and s:
        i = pos % len(s)
        t = s[:i] + ch + s[i + 1:]
    elif op == "ins":
        i = pos % (len(s) + 1)
        t = s[:i] + ch + s[i:]
    elif op == "del" and s:
        i = pos % len(s)
        t = s[:i] + s[i + 1:]
    else:
        t = s
    assert _levenshtein(s, t) <= 1
    assert _deletion_set(s) & _deletion_set(t), (s, t)


@settings(max_examples=100, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    k=st.integers(2, 10),
    n_parts=st.integers(1, 7),
)
def test_misra_gries_superset_property(tokens, k, n_parts):
    """The union of per-partition size-k MG summaries contains every
    token with global count > N/k (the candidate-pass guarantee
    curation.heavy_hitters relies on)."""
    import collections

    parts = [tokens[i::n_parts] for i in range(n_parts)]
    candidates = set()
    for part in parts:
        summary: dict = {}
        for tok in part:
            if tok in summary:
                summary[tok] += 1
            elif len(summary) < k:
                summary[tok] = 1
            else:
                dead = []
                for key in summary:
                    summary[key] -= 1
                    if summary[key] == 0:
                        dead.append(key)
                for key in dead:
                    del summary[key]
        candidates |= set(summary)
    counts = collections.Counter(tokens)
    n = len(tokens)
    for tok, cnt in counts.items():
        if cnt * k > n:
            assert tok in candidates, (tok, cnt, n, k)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(w, h, gray, seed):
    """Baseline JPEG encode->decode with all-ones quant tables is
    near-lossless: the only error sources are FDCT/IDCT float rounding
    (<=1) and, for RGB, the YCbCr integer round-trip (<=2) — bound 3.
    Dims are exercised off the 8x8 grid (edge-replication padding +
    decoder crop)."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    assert got is not None
    want = px[..., None] if gray else px
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 3


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    v=st.integers(0, 255),
)
def test_jpeg_flat_image_decodes_exactly(w, h, v):
    """A constant grayscale image quantizes to a single DC coefficient;
    with unit quant tables the decode must be bit-exact at ANY
    dimensions (including non-multiple-of-8 with padded edge blocks)."""
    px = np.full((h, w), v, dtype=np.uint8)
    got = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    assert got is not None and got.shape == (h, w, 1)
    assert (got == v).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    n_frames=st.integers(1, 8),
    every=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(w, h, n_frames, every, seed):
    """Uncompressed-AVI container roundtrip with random per-frame pixel
    data: header parse recovers dims/count, frame sampling decodes
    exactly frames 0, every, 2*every, ... bit-identically."""
    rng = np.random.default_rng(seed)
    frames_px = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                 for _ in range(n_frames)]
    stride = (w * 3 + 3) & ~3
    movi_frames = bytearray()
    for px in frames_px:
        bgr = px[::-1, :, ::-1]
        dib = b"".join(bgr[y].tobytes() + b"\x00" * (stride - 3 * w)
                       for y in range(h))
        movi_frames += b"00db" + struct.pack("<I", len(dib)) + dib
        if len(dib) & 1:
            movi_frames += b"\x00"
    avih = struct.pack("<10I", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h) + b"\x00" * 16
    hdrl = (b"LIST" + struct.pack("<I", 4 + 8 + 56) + b"hdrl"
            + b"avih" + struct.pack("<I", 56) + avih)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_frames)) + b"movi" + bytes(movi_frames)
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    assert mm.parse_avi_header(avi) == (w, h, 25.0, n_frames)
    got = mm.decode_avi_frames(avi, every=every)
    assert [i for i, _ in got] == list(range(0, n_frames, every))
    for i, px in got:
        assert np.array_equal(px, frames_px[i])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_matches_baseline_property(w, h, gray, seed):
    """Progressive (SOF2) and baseline (SOF0) encodings of the same
    array share quantized coefficients (identical all-ones tables), so
    the decodes must be BIT-IDENTICAL — one equality that covers DC
    first/refine, AC first with EOB runs, and AC refinement with
    correction bits end-to-end."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    prog = mm.decode_jpeg_pixels(mm.encode_jpeg_progressive(px))
    assert prog is not None and base is not None
    assert prog.shape == base.shape
    assert (prog == base).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    v=st.integers(0, 255),
)
def test_jpeg_progressive_flat_exact(w, h, v):
    """Flat images decode bit-exactly through the progressive path too
    (single DC coefficient split across first + refinement scans)."""
    px = np.full((h, w), v, dtype=np.uint8)
    got = mm.decode_jpeg_pixels(mm.encode_jpeg_progressive(px))
    assert got is not None and got.shape == (h, w, 1)
    assert (got == v).all()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_jpeg_progressive_low_contrast_eob_runs(seed):
    """Low-contrast images produce long EOB runs across blocks — the
    refinement branch where correction bits ride the EOBn flush."""
    rng = np.random.default_rng(seed)
    px = (128 + rng.integers(-3, 4, size=(24, 24, 3))).astype(np.uint8)
    base = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    prog = mm.decode_jpeg_pixels(mm.encode_jpeg_progressive(px))
    assert (prog == base).all()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    horiz_only=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_subsampled_gray_content_matches_baseline(w, h, horiz_only, seed):
    """R=G=B content has constant chroma (128), so 4:2:0/4:2:2
    box-average + replication is lossless on the chroma planes and the
    subsampled decode must equal the baseline decode BIT-IDENTICALLY —
    covers the MCU-interleaved entropy layout and upsampling on
    arbitrary (incl. odd) dimensions."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    px = np.stack([g] * 3, axis=-1)
    factors = (
        ((2, 1), (1, 1), (1, 1)) if horiz_only else ((2, 2), (1, 1), (1, 1))
    )
    base = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    sub = mm.decode_jpeg_pixels(mm.encode_jpeg_subsampled(px, factors))
    assert sub is not None and (sub == base).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    r=st.integers(0, 255),
    g=st.integers(0, 255),
    b=st.integers(0, 255),
)
def test_jpeg_subsampled_flat_color_bounded(w, h, r, g, b):
    """Flat color: chroma is constant so subsampling is exact; total
    error is just the YCbCr integer round-trip — bound 3, any dims."""
    px = np.zeros((h, w, 3), np.uint8)
    px[:] = (r, g, b)
    sub = mm.decode_jpeg_pixels(mm.encode_jpeg_subsampled(px))
    assert sub is not None and sub.shape == (h, w, 3)
    assert np.abs(sub.astype(int) - px.astype(int)).max() <= 3


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    gray=st.booleans(),
    dri=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_restart_interval_roundtrip(w, h, gray, dri, seed):
    """DRI restart markers (RSTn every dri MCUs, byte-aligned, DC
    predictors reset) must not change a single pixel vs the
    marker-free encoding of the same array."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    plain = mm.decode_jpeg_pixels(mm.encode_jpeg_baseline(px))
    with_rst = mm.decode_jpeg_pixels(
        mm.encode_jpeg_baseline(px, restart_interval=dri)
    )
    assert with_rst is not None and (with_rst == plain).all()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(4, 40),
    h=st.integers(4, 40),
    horiz_only=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_subsampled_matches_baseline_subsampled(
    w, h, horiz_only, seed
):
    """BOTH exotic dimensions combined — progressive scans over
    subsampled chroma: the quantized coefficients are identical to the
    baseline subsampled encoder's, so the decoded pixels must be
    BIT-IDENTICAL for any content, any dims (incl. the MCU-padding
    case where the luma DC grid exceeds the AC scan extent, e.g. 8x8
    at 4:2:0)."""
    import numpy as np

    factors = (
        ((2, 1), (1, 1), (1, 1)) if horiz_only else ((2, 2), (1, 1), (1, 1))
    )
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = mm.decode_jpeg_pixels(mm.encode_jpeg_subsampled(px, factors))
    prog = mm.decode_jpeg_pixels(mm.encode_jpeg_progressive(px, factors))
    assert prog is not None
    assert np.array_equal(base, prog)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    v=st.integers(0, 4095),
)
def test_jpeg_12bit_flat_exact(w, h, v):
    """12-bit extended sequential (SOF1): flat images quantize to one DC
    coefficient and decode bit-exactly at the full 0..4095 range."""
    import numpy as np

    px = np.full((h, w), v, dtype=np.uint16)
    got = mm.decode_jpeg_pixels(mm.encode_jpeg_12bit(px))
    assert got is not None and got.dtype == np.uint16
    assert np.array_equal(got.reshape(h, w), px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_12bit_roundtrip_bounded(w, h, seed):
    """Random 12-bit content roundtrips within the FDCT/IDCT rounding
    bound (all-ones quantization; same error class as the 8-bit bound,
    measured against the 16x larger sample range)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    got = mm.decode_jpeg_pixels(mm.encode_jpeg_12bit(px))
    assert got is not None
    err = np.abs(got.reshape(h, w).astype(int) - px.astype(int)).max()
    assert err <= 4


def test_jpeg_12bit_input_validation():
    import numpy as np

    import pytest

    with pytest.raises(ValueError, match="grayscale"):
        mm.encode_jpeg_12bit(np.zeros((4, 4, 3), dtype=np.uint16))
    with pytest.raises(ValueError, match="0..4095"):
        mm.encode_jpeg_12bit(np.full((4, 4), 5000, dtype=np.uint16))
    with pytest.raises(ValueError, match="0..4095"):
        mm.encode_jpeg_12bit(np.zeros((4, 4), dtype=np.uint8))
