"""In-process Ut Video (ULY0/ULY2) codec conformance.

The reference decodes Ut Video captures through libav
(ffmpegwrapper.cpp:543); `pipeline/utvideo.py` removes the external
dependency.  Conformance is pinned THREE ways, because OpenCV's
bundled libavcodec both encodes and decodes Ut Video:

  * libavcodec-ENCODED streams (cv2.VideoWriter) decode bit-exact
    through our decoder — the strongest direction: a real third-party
    encoder's output, including its multi-slice PAL layout;
  * our encoder's streams decode bit-exact through libavcodec
    (cv2.VideoCapture) for every predictor (none/left/gradient/median),
    both variants (ULY0 4:2:0, ULY2 4:2:2) and slice counts;
  * native core (uly_decode_plane) vs the Python spec, bit-identical.
"""
import struct

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import avi
from sdvpcmdecoder_tpu.pipeline import utvideo as utv

try:
    import cv2
    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False

PREDS = ["none", "left", "gradient", "median"]


def _pcm_raster(rng, H=48, W=64):
    f = (rng.random((H, W)) > 0.7).astype(np.uint8) * 200
    f[5:9] = 0
    f[:, 40:44] = 230
    return f


def _info(fourcc=b"ULY0", slices=1):
    return utv.StreamInfo(fourcc, utv.build_extradata(fourcc.decode(),
                                                      slices))


# -- self round trips -----------------------------------------------------------

@pytest.mark.parametrize("pred", PREDS)
@pytest.mark.parametrize("fourcc", ["ULY0", "ULY2"])
def test_frame_round_trip(pred, fourcc):
    rng = np.random.default_rng(hash((pred, fourcc)) % 1000)
    f = _pcm_raster(rng)
    extra, chunks = utv.encode(f[None], fourcc, pred=pred)
    info = utv.StreamInfo(fourcc.encode(), extra)
    np.testing.assert_array_equal(
        utv.decode_frame_gray(chunks[0], 64, 48, info), f)


@pytest.mark.parametrize("slices", [1, 2, 5])
def test_multi_slice_round_trip(slices):
    rng = np.random.default_rng(slices)
    f = _pcm_raster(rng, H=50, W=32)
    extra, chunks = utv.encode(f[None], "ULY0", pred="median",
                               slices=slices)
    info = utv.StreamInfo(b"ULY0", extra)
    assert info.slices == slices
    np.testing.assert_array_equal(
        utv.decode_frame_gray(chunks[0], 32, 50, info), f)


def test_fsym_plane_round_trip():
    """Solid planes use the single-symbol (length 0) convention."""
    for pred in PREDS:
        f = np.full((24, 32), 99, np.uint8)
        extra, chunks = utv.encode(f[None], "ULY0", pred=pred, slices=2)
        info = utv.StreamInfo(b"ULY0", extra)
        np.testing.assert_array_equal(
            utv.decode_frame_gray(chunks[0], 32, 24, info), f)


def test_noise_round_trip():
    rng = np.random.default_rng(7)
    f = rng.integers(0, 256, (32, 48), np.uint8)
    extra, chunks = utv.encode(f[None], "ULY2", pred="left")
    info = utv.StreamInfo(b"ULY2", extra)
    np.testing.assert_array_equal(
        utv.decode_frame_gray(chunks[0], 48, 32, info), f)


def test_planes_round_trip():
    rng = np.random.default_rng(8)
    y = _pcm_raster(rng, H=32, W=64)
    u = rng.integers(100, 160, (16, 32), np.uint8)
    v = rng.integers(100, 160, (16, 32), np.uint8)
    info = _info()
    chunk = utv.encode_frame(y, info, utv.PRED_MEDIAN, chroma=(u, v))
    y2, u2, v2 = utv.decode_frame_planes(chunk, 64, 32, info)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


# -- error paths ------------------------------------------------------------------

def test_interlaced_rejected():
    extra = bytearray(utv.build_extradata("ULY0"))
    extra[13] |= 0x08  # flags bit 11
    with pytest.raises(utv.UtVideoError, match="interlaced"):
        utv.StreamInfo(b"ULY0", bytes(extra))


def test_unknown_variant_rejected():
    with pytest.raises(utv.UtVideoError, match="variant"):
        utv.StreamInfo(b"ULRA", utv.build_extradata("ULY0"))


def test_truncated_plane_rejected():
    info = _info()
    with pytest.raises(utv.UtVideoError):
        utv.decode_frame_gray(b"\x00" * 64, 32, 24, info)


def test_bad_slice_offsets_rejected():
    info = _info()
    f = _pcm_raster(np.random.default_rng(0), H=24, W=32)
    chunk = bytearray(utv.encode_frame(f, info, utv.PRED_LEFT))
    struct.pack_into("<I", chunk, 256, 1 << 30)  # luma slice end absurd
    with pytest.raises(utv.UtVideoError):
        utv.decode_frame_gray(bytes(chunk), 32, 24, info)


# -- native core bit-identity -------------------------------------------------------

def _native_available():
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    return sn.available()


@pytest.mark.skipif(not _native_available(),
                    reason="native core unavailable")
@pytest.mark.parametrize("pred", PREDS)
def test_native_decode_bit_identical(pred):
    rng = np.random.default_rng(11)
    planes = [_pcm_raster(rng, H=50, W=64),
              rng.integers(0, 256, (24, 24), np.uint8),
              np.full((20, 16), 7, np.uint8)]
    for p in planes:
        for slices in (1, 3):
            H, W = p.shape
            extra, chunks = utv.encode(p[None], "ULY0", pred=pred,
                                       slices=slices)
            info = utv.StreamInfo(b"ULY0", extra)
            a = utv.decode_frame_gray(chunks[0], W, H, info, native=True)
            b = utv.decode_frame_gray(chunks[0], W, H, info, native=False)
            np.testing.assert_array_equal(a, p)
            np.testing.assert_array_equal(b, p)


# -- AVI integration -----------------------------------------------------------------

def test_uly_avi_round_trip(tmp_path):
    rng = np.random.default_rng(12)
    frames = np.stack([_pcm_raster(rng, H=24, W=64) for _ in range(3)])
    for codec in ("ULY0", "ULY2"):
        p = tmp_path / f"{codec}.avi"
        avi.write_avi(p, frames, codec=codec)
        with avi.AVIReader(p) as rd:
            assert rd.n_frames == 3
            np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


def test_uly_avi_full_pipeline_matches_y800(tmp_path):
    from sdvpcmdecoder_tpu.pipeline import ingest
    rng = np.random.default_rng(13)
    frames = np.stack([_pcm_raster(rng, H=32, W=96) for _ in range(2)])
    pu = tmp_path / "u.avi"
    py = tmp_path / "y.avi"
    avi.write_avi(pu, frames, codec="ULY0")
    avi.write_avi(py, frames, codec="Y800")
    with ingest.open_capture(pu) as a, ingest.open_capture(py) as b:
        np.testing.assert_array_equal(a.read_frames(0, 2),
                                      b.read_frames(0, 2))


@pytest.mark.skipif(not _native_available(),
                    reason="native core unavailable")
def test_batch_decode_matches_per_frame(tmp_path):
    """The frame-parallel batch path (OMP) must equal per-frame decode
    for ULY/LAGS/HFYU, including dropped slots (black frames)."""
    rng = np.random.default_rng(20)
    frames = np.stack([_pcm_raster(rng, H=32, W=64) for _ in range(5)])
    for codec in ("ULY0", "LAGS", "HFYU"):
        p = tmp_path / f"b_{codec}.avi"
        avi.write_avi(p, frames, codec=codec, drops=[2])
        with avi.AVIReader(p) as rd:
            assert rd.n_frames == 6 and rd.dropped_frames == 1
            batch = rd.read_frames(0, 6)
            # force the scalar path for comparison
            rd._batch = None
            scalar = rd.read_frames(0, 6)
        np.testing.assert_array_equal(batch, scalar, err_msg=codec)
        assert not batch[2].any()      # dropped slot is black


def test_batch_error_falls_back_per_frame(tmp_path):
    """A frame the batch decoder rejects re-decodes per-frame so the
    exact codec error (with the transcode hint) surfaces."""
    from sdvpcmdecoder_tpu.pipeline import lagarith as lg
    rng = np.random.default_rng(21)
    frames = np.stack([_pcm_raster(rng, H=24, W=32) for _ in range(3)])
    chunks = lg.encode(frames)
    # frame 1 becomes an unsupported YUY2-arith frame type
    chunks[1] = bytes([lg.FRAME_ARITH_YUY2]) + chunks[1][1:]
    p = tmp_path / "bad.avi"
    avi.write_avi(p, frames, codec="LAGS", payloads=chunks)
    with avi.AVIReader(p) as rd:
        with pytest.raises(avi.AVIError, match="frame type"):
            rd.read_frames(0, 3)


# -- external anchor (libavcodec via OpenCV, both directions) -------------------------

def _cv2_luma_frames(path, F, H, W):
    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for _ in range(F):
        ok, img = cap.read()
        assert ok
        out.append(img.reshape(-1, W)[:H].copy())
    cap.release()
    return np.stack(out)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
def test_external_anchor_libavcodec_encoded_stream_decodes(tmp_path):
    """The strongest direction: a REAL third-party encoder's streams
    (cv2's libavcodec utvideo encoder) decode bit-exact through our
    decoder — including its own slice layout and code tables."""
    rng = np.random.default_rng(14)
    H, W = 96, 128
    frames = [(_pcm_raster(rng, H=H, W=W)) for _ in range(2)]
    p = str(tmp_path / "libav.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"ULY0"), 25, (W, H),
                        False)
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()
    # libavcodec's own decode of its own stream = ground truth luma
    truth = _cv2_luma_frames(p, 2, H, W)
    # parse the AVI with our reader (extradata + chunks) and compare
    with avi.AVIReader(p) as rd:
        got = rd.read_frames(0, 2)
    np.testing.assert_array_equal(got, truth)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
@pytest.mark.parametrize("pred", PREDS)
@pytest.mark.parametrize("fourcc", ["ULY0", "ULY2"])
def test_external_anchor_our_streams_decode_in_libavcodec(tmp_path, pred,
                                                          fourcc):
    rng = np.random.default_rng(15)
    frames = np.stack([_pcm_raster(rng, H=48, W=64) for _ in range(2)])
    extra, chunks = utv.encode(frames, fourcc, pred=pred, slices=2)
    p = tmp_path / "ours.avi"
    avi.write_avi(p, frames, codec=fourcc, payloads=chunks,
                  extradata=extra)
    np.testing.assert_array_equal(_cv2_luma_frames(p, 2, 48, 64), frames)
