"""In-process Lagarith (LAGS) codec conformance.

The reference decodes Lagarith captures through libav
(ffmpegwrapper.cpp:543); `pipeline/lagarith.py` removes the external
dependency.  Conformance is pinned two ways:

  * self round trips (encoder -> decoder bit-exact) over PCM-raster-like,
    noisy, sparse, and solid frames, covering the rac, raw-residual and
    solid plane modes plus the zero-run escape machinery;
  * an EXTERNAL anchor: OpenCV's bundled libavcodec decodes this
    encoder's LAGS AVIs and the luma must match pixel-for-pixel —
    including a stream whose probability table does NOT sum to a power
    of two, which forces libavcodec and our decoder through their
    respective softfloat rescale paths and requires they derive the
    same table.
"""
import struct

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import avi
from sdvpcmdecoder_tpu.pipeline import lagarith as lg

try:
    import cv2
    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False


def _pcm_raster(rng, H=64, W=128):
    """Mostly-dark frame with bright bit stripes, like a PCM capture."""
    f = (rng.random((H, W)) > 0.7).astype(np.uint8) * 200
    f[5:9] = 0
    f[:, 60:64] = 230
    return f


# -- plane / frame round trips ------------------------------------------------

def test_plane_round_trip_rac():
    rng = np.random.default_rng(0)
    p = _pcm_raster(rng)
    enc = lg.encode_plane(p)
    assert enc[0] in (1, 2, 3)       # rac mode engaged
    out = lg.decode_plane(enc + b"\x00\x00", 0, 128, 64)
    np.testing.assert_array_equal(out, p)


@pytest.mark.parametrize("esc", [1, 2, 3])
def test_plane_round_trip_all_escape_counts(esc):
    rng = np.random.default_rng(esc)
    p = _pcm_raster(rng, H=32, W=48)
    enc = lg.encode_plane(p, esc_num=esc)
    out = lg.decode_plane(enc + b"\x00\x00", 0, 48, 32)
    np.testing.assert_array_equal(out, p)


def test_plane_round_trip_raw_fallback():
    # incompressible noise -> encoder falls back to raw residuals
    rng = np.random.default_rng(2)
    p = rng.integers(0, 256, (16, 16), np.uint8)
    enc = lg.encode_plane(p)
    out = lg.decode_plane(enc + b"\x00\x00", 0, 16, 16)
    np.testing.assert_array_equal(out, p)


def test_plane_solid_fill():
    p = np.full((20, 30), 123, np.uint8)
    enc = lg.encode_plane(p)
    assert enc == bytes([0xFF, 123])
    out = lg.decode_plane(enc, 0, 30, 20)
    np.testing.assert_array_equal(out, p)


def test_zero_runs_crossing_rows():
    """Long zero runs spanning row boundaries exercise the cross-row
    zeros_rem carry in both the symbolizer and the decoder."""
    p = np.zeros((40, 64), np.uint8)
    p[0, 0] = 200
    p[13, 7] = 90
    p[39, 63] = 45
    enc = lg.encode_plane(p)
    out = lg.decode_plane(enc + b"\x00\x00", 0, 64, 40)
    np.testing.assert_array_equal(out, p)


def test_frame_round_trip_gray():
    rng = np.random.default_rng(3)
    f = _pcm_raster(rng, H=48, W=96)
    d = lg.decode_frame_gray(lg.encode_frame(f), 96, 48)
    np.testing.assert_array_equal(d, f)


def test_frame_solid_gray():
    f = np.full((24, 32), 17, np.uint8)
    chunk = lg.encode_frame(f)
    assert chunk[0] == lg.FRAME_SOLID_GRAY
    np.testing.assert_array_equal(lg.decode_frame_gray(chunk, 32, 24), f)


def test_frame_planes_round_trip():
    rng = np.random.default_rng(4)
    y = _pcm_raster(rng, H=32, W=64)
    v = rng.integers(100, 160, (16, 32), np.uint8)
    u = rng.integers(100, 160, (16, 32), np.uint8)
    chunk = lg.encode_frame(y, chroma=(v, u))
    y2, v2, u2 = lg.decode_frame_planes(chunk, 64, 32)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(v2, v)
    np.testing.assert_array_equal(u2, u)


# -- native core bit-identity ----------------------------------------------------

def _native_available():
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    return sn.available()


@pytest.mark.skipif(not _native_available(),
                    reason="native core unavailable")
def test_native_plane_decode_bit_identical():
    """lags_decode_plane (C) vs the Python spec over all plane modes,
    escape counts, and a non-power-of-two (softfloat) table."""
    rng = np.random.default_rng(9)
    planes = [
        _pcm_raster(rng, H=48, W=96),                      # rac
        rng.integers(0, 256, (24, 24), np.uint8),          # raw fallback
        np.full((16, 16), 9, np.uint8),                    # solid
        np.zeros((32, 48), np.uint8),                      # long zero runs
    ]
    planes[3][3, 5] = 77
    for p in planes:
        for esc in (1, 2, 3):
            enc = lg.encode_plane(p, esc_num=esc) + b"\x00\x00"
            H, W = p.shape
            a = lg.decode_plane(enc, 0, W, H, native=True)
            b = lg.decode_plane(enc, 0, W, H, native=False)
            np.testing.assert_array_equal(a, p)
            np.testing.assert_array_equal(b, p)
    # softfloat: non-pow2 table stream (built by hand, as in the
    # external anchor test)
    y = _pcm_raster(rng, H=24, W=64)
    res = lg._residual_plane(y)
    syms = lg._symbolize(res, 2)
    probs = lg._norm_probs(syms, 15)
    probs[int(np.argmax(probs))] -= 1
    cum, scale = lg.scale_prob_table(probs)
    enc = lg._RacEncoder(cum, scale)
    for s in syms:
        enc.put(s)
    rac_bytes, nbytes = enc.finish()
    bw = lg._BitWriter()
    lg._write_probs(bw, probs)
    plane = (bytes([2])
             + struct.pack("<I", max(nbytes + 2, len(syms)))
             + bw.align_byte() + rac_bytes + b"\x00\x00")
    a = lg.decode_plane(plane, 0, 64, 24, native=True)
    b = lg.decode_plane(plane, 0, 64, 24, native=False)
    np.testing.assert_array_equal(a, y)
    np.testing.assert_array_equal(b, y)


@pytest.mark.skipif(not _native_available(),
                    reason="native core unavailable")
def test_native_plane_error_codes_match_python():
    cases = [
        bytes([5, 0, 0, 0, 0]),          # zero-run-line -> unsupported
        bytes([0, 0, 0, 0, 0]),          # invalid zero rle code
        bytes([9, 0, 0, 0, 0]),          # invalid escape
        bytes([4, 1, 2]),                # truncated raw plane
    ]
    for src in cases:
        with pytest.raises(lg.LagarithError):
            lg.decode_plane(src, 0, 8, 8, native=True)
        with pytest.raises(lg.LagarithError):
            lg.decode_plane(src, 0, 8, 8, native=False)


# -- error paths ----------------------------------------------------------------

def test_zero_run_line_coding_rejected():
    with pytest.raises(lg.LagarithError, match="zero-run-line"):
        lg.decode_plane(bytes([5, 0, 0, 0, 0]), 0, 8, 8)


def test_unsupported_frame_type_rejected():
    with pytest.raises(lg.LagarithError, match="frame type"):
        lg.decode_frame_gray(bytes([2]) + b"\x00" * 20, 8, 8)


def test_truncated_frame_rejected():
    with pytest.raises(lg.LagarithError):
        lg.decode_frame_gray(b"", 8, 8)
    with pytest.raises(lg.LagarithError, match="truncated"):
        lg.decode_frame_gray(bytes([lg.FRAME_ARITH_YV12, 0, 0]), 8, 8)


# -- softfloat rescale -----------------------------------------------------------

def test_scale_prob_table_pow2_identity():
    probs = [0] * 256
    probs[0] = 1 << 14
    probs[7] = 1 << 14
    cum, scale = lg.scale_prob_table(probs)
    assert scale == 15
    assert cum[256] == 1 << 15
    assert cum[8] - cum[7] == 1 << 14


def test_scale_prob_table_non_pow2_rescales():
    """Non-power-of-two sum -> next power of two, deficit distributed
    +1 ascending over nonzero symbols < 128 (the libavcodec rule)."""
    probs = [0] * 256
    probs[0] = 100
    probs[1] = 50
    probs[200] = 30           # symbol >= 128: never receives deficit
    cum, scale = lg.scale_prob_table(probs)
    total = 1 << scale
    assert cum[256] == total
    assert total == 256       # 180 -> 256
    p0 = cum[1] - cum[0]
    p1 = cum[2] - cum[1]
    p200 = cum[201] - cum[200]
    # floor scaling: 100*256//180=142, 50*256//180=71, 30*256//180=42
    # deficit = 256-255 = 1 -> +1 to symbol 0 (first nonzero < 128)
    assert (p0, p1, p200) == (143, 71, 42)


def test_zero_run_zigzag_inverse():
    for run in range(256):
        assert lg._calc_zero_run(lg._zero_run_byte(run)) == run


def test_prob_vlc_round_trip():
    vals = [0, 1, 2, 3, 7, 12, 100, 255, 1 << 14, (1 << 20) - 3]
    bw = lg._BitWriter()
    for v in vals:
        lg._write_prob_vlc(bw, v)
    data = bw.align_byte()
    br = lg._BitReader(data)
    for v in vals:
        assert lg._read_prob_vlc(br) == v


# -- AVI integration --------------------------------------------------------------

def test_lags_avi_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    frames = np.stack([_pcm_raster(rng, H=24, W=64) for _ in range(3)])
    p = tmp_path / "l.avi"
    avi.write_avi(p, frames, codec="LAGS")
    with avi.AVIReader(p) as rd:
        assert rd.n_frames == 3
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


def test_lags_avi_full_pipeline_matches_y800(tmp_path):
    """A LAGS capture must decode to the same lines as the identical
    uncompressed capture — codec transparency through the ingest layer."""
    from sdvpcmdecoder_tpu.pipeline import ingest
    rng = np.random.default_rng(6)
    frames = np.stack([_pcm_raster(rng, H=32, W=96) for _ in range(2)])
    pl = tmp_path / "l.avi"
    py = tmp_path / "y.avi"
    avi.write_avi(pl, frames, codec="LAGS")
    avi.write_avi(py, frames, codec="Y800")
    with ingest.open_capture(pl) as a, ingest.open_capture(py) as b:
        np.testing.assert_array_equal(a.read_frames(0, 2),
                                      b.read_frames(0, 2))


# -- external anchor (libavcodec via OpenCV) ---------------------------------------

def _cv2_luma_frames(path, F, H, W):
    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for _ in range(F):
        ok, img = cap.read()
        assert ok
        # raw yuv420p surfaces as one 8UC1 plane; luma is the top H rows
        out.append(img.reshape(-1, W)[:H].copy())
    cap.release()
    return np.stack(out)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
def test_external_anchor_libavcodec_decodes_our_lags(tmp_path):
    rng = np.random.default_rng(7)
    frames = np.stack([_pcm_raster(rng, H=24, W=64) for _ in range(3)])
    p = tmp_path / "anchor.avi"
    avi.write_avi(p, frames, codec="LAGS")
    np.testing.assert_array_equal(_cv2_luma_frames(p, 3, 24, 64), frames)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
def test_external_anchor_solid_gray(tmp_path):
    """Solid frames anchored in their own stream: libavcodec surfaces
    FRAME_SOLID_GRAY as gbrap, and cv2 converts a mid-stream pix_fmt
    switch through limited-range swscale — so mixing arith and solid
    frames in ONE cv2 read would compare post-conversion values, not
    codec output."""
    frames = np.full((2, 24, 64), 55, np.uint8)
    p = tmp_path / "solid.avi"
    avi.write_avi(p, frames, codec="LAGS")
    np.testing.assert_array_equal(_cv2_luma_frames(p, 2, 24, 64), frames)
    # our reader on a MIXED stream stays bit-exact (no swscale involved)
    rng = np.random.default_rng(7)
    mixed = np.stack([_pcm_raster(rng, H=24, W=64) for _ in range(3)])
    mixed[1, :, :] = 55
    pm = tmp_path / "mixed.avi"
    avi.write_avi(pm, mixed, codec="LAGS")
    with avi.AVIReader(pm) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 3), mixed)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
@pytest.mark.parametrize("esc", [1, 3])
def test_external_anchor_escape_counts(tmp_path, esc):
    rng = np.random.default_rng(8 + esc)
    frames = np.stack([_pcm_raster(rng, H=16, W=48)])
    p = tmp_path / f"esc{esc}.avi"
    avi.write_avi(p, frames, codec="LAGS")
    # re-encode with the requested escape count
    raw = lg.encode(frames, esc_num=esc)
    avi.write_avi(p, frames, codec="LAGS")
    _write_lags_payloads(p, frames, raw)
    np.testing.assert_array_equal(_cv2_luma_frames(p, 1, 16, 48), frames)
    with avi.AVIReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 1), frames)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
def test_external_anchor_softfloat_non_pow2_table(tmp_path):
    """Force a probability table whose sum is NOT a power of two.  Both
    libavcodec and our decoder must rescale it the same way or the rac
    symbols diverge immediately — the strongest possible check of
    scale_prob_table against the reference implementation."""
    rng = np.random.default_rng(11)
    y = _pcm_raster(rng, H=24, W=64)
    res = lg._residual_plane(y)
    syms = lg._symbolize(res, 2)
    probs = lg._norm_probs(syms, 15)
    # perturb: drop one count from the largest symbol -> sum = 2^15 - 1
    probs[int(np.argmax(probs))] -= 1
    assert sum(probs) & (sum(probs) - 1)       # not a power of two
    cum, scale = lg.scale_prob_table(probs)
    enc = lg._RacEncoder(cum, scale)
    for s in syms:
        enc.put(s)
    rac_bytes, nbytes = enc.finish()
    bw = lg._BitWriter()
    lg._write_probs(bw, probs)
    hdr = bw.align_byte()
    length = max(nbytes + 2, len(syms))
    assert length < 64 * 24
    plane = bytes([2]) + struct.pack("<I", length) + hdr + rac_bytes
    ch = np.full((12, 32), 128, np.uint8)
    pv = lg.encode_plane(ch)
    off_v = 9 + len(plane)
    off_u = off_v + len(pv)
    chunk = (bytes([lg.FRAME_ARITH_YV12]) + struct.pack("<II", off_v, off_u)
             + plane + pv + pv + b"\x00\x00")
    # our decoder round-trips it
    np.testing.assert_array_equal(lg.decode_frame_gray(chunk, 64, 24), y)
    # libavcodec agrees
    p = tmp_path / "softfloat.avi"
    frames = y[None]
    avi.write_avi(p, frames, codec="LAGS")
    _write_lags_payloads(p, frames, [chunk])
    np.testing.assert_array_equal(_cv2_luma_frames(p, 1, 24, 64), frames)


def _write_lags_payloads(path, frames, payloads):
    """Rewrite an existing 1-stream LAGS AVI with custom frame chunks."""
    avi.write_avi(path, frames, codec="LAGS", payloads=payloads)
