"""In-process FFV1 v3 codec conformance.

The reference decodes FFV1 captures through libav
(ffmpegwrapper.cpp:543); `pipeline/ffv1.py` removes the external
dependency.  Conformance is pinned in BOTH directions against
libavcodec (OpenCV's bundled ffmpeg encodes AND decodes FFV1):

  * libavcodec-ENCODED streams (its default: v3, Golomb-Rice coder,
    2x2 slices, slice CRCs, GOP > 1 so contexts carry across frames)
    decode bit-exact through our decoder;
  * our encoder's streams (v3, range coder, intra-only) decode
    bit-exact through libavcodec;
  * plus self round trips and container-level error paths.
"""
import struct

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import avi
from sdvpcmdecoder_tpu.pipeline import ffv1 as fv

try:
    import cv2
    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False


def _mixed_frames(rng, F=3, H=64, W=96):
    """Raster + gradient content: exercises run mode (flat), contexts
    (gradients) and high-entropy regions (noise) in one stream."""
    out = []
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(F):
        f = (rng.random((H, W)) > 0.7).astype(np.uint8) * 200
        f = np.where(xx < W // 3,
                     ((yy * 3 + xx * 2 + i * 17) % 256).astype(np.uint8),
                     f)
        f[:4] = 0                      # flat band -> run mode
        out.append(f)
    return np.stack(out)


# -- core primitives --------------------------------------------------------------

def test_crc32_ieee_known_vector():
    # CRC-32/MPEG-2 family (poly 0x04C11DB7, init as given, MSB-first):
    # appending the big-endian CRC of a buffer must zero the total.
    data = b"123456789"
    crc = fv.crc32_ieee(data)
    assert fv.crc32_ieee(data + struct.pack(">I", crc)) == 0


def test_range_coder_round_trip():
    rng = np.random.default_rng(0)
    vals = [int(v) for v in rng.integers(-255, 256, 500)]
    enc = fv.RangeEncoder()
    st = np.full(32, 128, np.uint8)
    for v in vals:
        enc.put_symbol(st, v, 1)
    buf = enc.finish()
    dec = fv.RangeDecoder(buf + b"\x00\x00")
    st2 = np.full(32, 128, np.uint8)
    got = [dec.get_symbol(st2, 1) for _ in vals]
    assert got == vals


def test_golomb_reader_escape():
    # value >= limit-1 escapes: limit zeros then esc_len raw bits
    bw = bytearray()
    bits = "0" * 12 + format(200, "08b") + "00000000"
    for i in range(0, len(bits), 8):
        bw.append(int(bits[i:i + 8], 2))
    gb = fv.BitReader(bytes(bw))
    assert fv.get_ur_golomb(gb, 0, 12, 8) == 200 + 11


# -- self round trips ---------------------------------------------------------------

def test_encode_decode_round_trip():
    frames = _mixed_frames(np.random.default_rng(1))
    extra, chunks = fv.encode(frames)
    assert fv.crc32_ieee(extra) == 0
    dec = fv.Decoder(extra, frames.shape[2], frames.shape[1])
    for c, f in zip(chunks, frames):
        y, key = dec.decode_frame_gray(c)
        assert key                     # intra-only encoder
        np.testing.assert_array_equal(y, f)


def test_noise_round_trip():
    rng = np.random.default_rng(2)
    f = rng.integers(0, 256, (48, 64), np.uint8)
    extra, chunks = fv.encode(f[None])
    dec = fv.Decoder(extra, 64, 48)
    np.testing.assert_array_equal(dec.decode_frame_gray(chunks[0])[0], f)


def test_solid_round_trip():
    f = np.full((32, 48), 123, np.uint8)
    extra, chunks = fv.encode(f[None])
    dec = fv.Decoder(extra, 48, 32)
    np.testing.assert_array_equal(dec.decode_frame_gray(chunks[0])[0], f)


# -- error paths ----------------------------------------------------------------------

def test_extradata_crc_rejected():
    extra = bytearray(fv.build_extradata())
    extra[len(extra) // 2] ^= 0xFF     # version still parses as 3
    with pytest.raises(fv.FFV1Error, match="CRC"):
        fv.StreamConfig(bytes(extra))


def test_slice_crc_rejected():
    f = _mixed_frames(np.random.default_rng(3), F=1)
    extra, chunks = fv.encode(f)
    bad = bytearray(chunks[0])
    bad[len(bad) // 2] ^= 0xFF
    dec = fv.Decoder(extra, f.shape[2], f.shape[1])
    with pytest.raises(fv.FFV1Error, match="CRC"):
        dec.decode_frame_gray(bytes(bad))


def test_missing_keyframe_rejected():
    f = _mixed_frames(np.random.default_rng(4), F=1)
    extra, chunks = fv.encode(f)
    dec = fv.Decoder(extra, f.shape[2], f.shape[1])
    # flip the keyframe bit region: a non-key first frame must raise
    with pytest.raises(fv.FFV1Error):
        bad = bytes([chunks[0][0] ^ 0x80]) + chunks[0][1:]
        dec.decode_frame_gray(bad)


def test_initial_states_parse():
    """Transmitted initial states use one SEPARATE rac state array per
    context byte k (libavcodec state2[k]); fields after them (ec,
    intra) must still parse correctly."""
    enc = fv.RangeEncoder()
    state = [128] * fv.CONTEXT_SIZE
    enc.put_symbol(state, 3, 0)       # version
    enc.put_symbol(state, 4, 0)       # micro_version
    enc.put_symbol(state, 1, 0)       # coder: range
    enc.put_symbol(state, 0, 0)       # colorspace
    enc.put_symbol(state, 8, 0)       # bits
    enc.put_rac(state, 0, 0)          # chroma_planes
    enc.put_symbol(state, 0, 0)
    enc.put_symbol(state, 0, 0)
    enc.put_rac(state, 0, 0)          # transparency
    enc.put_symbol(state, 0, 0)       # h slices - 1
    enc.put_symbol(state, 0, 0)       # v slices - 1
    enc.put_symbol(state, 1, 0)       # quant_table_count
    for _ in range(3):
        fv._write_quant_table(enc, fv._ENC_LEVELS)
    for _ in range(2):
        fv._write_quant_table(enc, [0] * 128)
    enc.put_rac(state, 0, 1)          # HAS initial states
    cc = fv._enc_quant_table()[1]
    rng = np.random.default_rng(0)
    ini = rng.integers(0, 256, (cc, fv.CONTEXT_SIZE)).astype(np.int64)
    st2 = [[128] * fv.CONTEXT_SIZE for _ in range(fv.CONTEXT_SIZE)]
    pred = [128] * fv.CONTEXT_SIZE
    for j in range(cc):
        for k in range(fv.CONTEXT_SIZE):
            delta = int(ini[j, k]) - pred[k]
            if delta > 127:
                delta -= 256
            elif delta < -128:
                delta += 256
            enc.put_symbol(st2[k], delta, 1)
            pred[k] = int(ini[j, k])
    enc.put_symbol(state, 1, 0)       # ec
    enc.put_symbol(state, 1, 0)       # intra
    body = enc.finish()
    extra = body + struct.pack(">I", fv.crc32_ieee(body))
    cfg = fv.StreamConfig(extra)
    assert cfg.ec == 1 and cfg.intra == 1
    got = cfg.initial_states[0]
    assert got is not None
    np.testing.assert_array_equal(got, (ini & 0xFF).astype(np.uint8))


def test_chroma_stream_luma_decodes(tmp_path):
    """FFV1 yuv420p streams (chroma_planes=1, the common archival
    pixel format) decode their luma in-process — chroma follows luma
    in the bitstream and is simply never parsed.  Both decoder twins
    agree, and (below, when cv2 is present) libavcodec accepts the
    same stream, proving the chroma planes are well-formed."""
    rng = np.random.default_rng(11)
    H, W = 48, 64
    frames = _mixed_frames(rng, F=2, H=H, W=W)
    enc = fv.Encoder(W, H, chroma_planes=True)
    cb = rng.integers(100, 160, (H // 2, W // 2), np.uint8)
    cr = rng.integers(100, 160, (H // 2, W // 2), np.uint8)
    chunks = [enc.encode_frame(f, chroma=(cb, cr)) for f in frames]
    assert fv.StreamConfig(enc.extradata).chroma_planes == 1
    for native in (True, False):
        dec = fv.Decoder(enc.extradata, W, H, native=native)
        for c, f in zip(chunks, frames):
            y, _ = dec.decode_frame_gray(c)
            np.testing.assert_array_equal(y, f)
    if HAVE_CV2:
        p = tmp_path / "c.avi"
        avi.write_avi(p, frames, codec="FFV1", payloads=chunks,
                      extradata=enc.extradata)
        np.testing.assert_array_equal(_cv2_luma_frames(p, 2, H, W),
                                      frames)


# -- AVI integration ----------------------------------------------------------------

def test_ffv1_avi_round_trip(tmp_path):
    frames = _mixed_frames(np.random.default_rng(5))
    p = tmp_path / "f.avi"
    avi.write_avi(p, frames, codec="FFV1")
    with avi.AVIReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)
        # out-of-order access rewinds and rolls forward
        np.testing.assert_array_equal(rd.read_frames(2, 1)[0], frames[2])
        np.testing.assert_array_equal(rd.read_frames(0, 1)[0], frames[0])


def test_ffv1_avi_full_pipeline_matches_y800(tmp_path):
    from sdvpcmdecoder_tpu.pipeline import ingest
    rng = np.random.default_rng(6)
    frames = np.stack([(rng.random((32, 96)) > 0.7).astype(np.uint8)
                       * 200 for _ in range(2)])
    pf = tmp_path / "f.avi"
    py = tmp_path / "y.avi"
    avi.write_avi(pf, frames, codec="FFV1")
    avi.write_avi(py, frames, codec="Y800")
    with ingest.open_capture(pf) as a, ingest.open_capture(py) as b:
        np.testing.assert_array_equal(a.read_frames(0, 2),
                                      b.read_frames(0, 2))


# -- native core bit-identity ---------------------------------------------------------

def _native_available():
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    return sn.available()


@pytest.mark.skipif(not _native_available(),
                    reason="native core unavailable")
def test_native_decode_bit_identical_rac():
    frames = _mixed_frames(np.random.default_rng(9), F=4)
    extra, chunks = fv.encode(frames)
    H, W = frames.shape[1], frames.shape[2]
    dn = fv.Decoder(extra, W, H, native=True)
    dp = fv.Decoder(extra, W, H, native=False)
    for c, f in zip(chunks, frames):
        a, ka = dn.decode_frame_gray(c)
        b, kb = dp.decode_frame_gray(c)
        assert ka == kb
        np.testing.assert_array_equal(a, f)
        np.testing.assert_array_equal(b, f)


@pytest.mark.skipif(not (_native_available() and HAVE_CV2),
                    reason="native core or OpenCV unavailable")
def test_native_decode_bit_identical_golomb(tmp_path):
    """Native vs Python on a real libavcodec golomb stream, including
    carried contexts across the non-keyframes."""
    rng = np.random.default_rng(10)
    H, W, F = 96, 128, 5
    frames = _mixed_frames(rng, F=F, H=H, W=W)
    p = str(tmp_path / "g.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 25, (W, H),
                        False)
    for f in frames:
        w.write(f)
    w.release()
    raw = open(p, "rb").read()
    k = raw.find(b"strf")
    size = struct.unpack_from("<I", raw, k + 4)[0]
    extra = raw[k + 8 + 40:k + 8 + size]
    with avi.AVIReader(p) as rd:
        entries = list(rd._entries)
        chunks = [bytes(rd._mm[o:o + s]) for o, s in entries]
    dn = fv.Decoder(extra, W, H, native=True)
    dp = fv.Decoder(extra, W, H, native=False)
    for c in chunks:
        a, ka = dn.decode_frame_gray(c)
        b, kb = dp.decode_frame_gray(c)
        assert ka == kb
        np.testing.assert_array_equal(a, b)


# -- external anchors (libavcodec via OpenCV, both directions) ------------------------

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
def test_external_anchor_libavcodec_golomb_stream_decodes(tmp_path):
    """libavcodec's default FFV1 (v3 golomb, multi-slice, slice CRCs,
    contexts carried across non-keyframes) decodes bit-exact here."""
    rng = np.random.default_rng(7)
    H, W, F = 96, 128, 5
    frames = _mixed_frames(rng, F=F, H=H, W=W)
    p = str(tmp_path / "libav.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FFV1"), 25, (W, H),
                        False)
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()
    truth = _cv2_luma_frames(p, F, H, W)
    with avi.AVIReader(p) as rd:
        got = rd.read_frames(0, F)
    np.testing.assert_array_equal(got, truth)
    # sanity: the stream really does carry contexts (a non-keyframe)
    raw = open(p, "rb").read()
    k = raw.find(b"strf")
    size = struct.unpack_from("<I", raw, k + 4)[0]
    cfg = fv.StreamConfig(raw[k + 8 + 40:k + 8 + size])
    assert cfg.ac == 0 and cfg.intra == 0


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
def test_external_anchor_our_streams_decode_in_libavcodec(tmp_path):
    frames = _mixed_frames(np.random.default_rng(8))
    p = tmp_path / "ours.avi"
    avi.write_avi(p, frames, codec="FFV1")
    np.testing.assert_array_equal(
        _cv2_luma_frames(p, 3, frames.shape[1], frames.shape[2]), frames)
