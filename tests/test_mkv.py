"""In-process Matroska container ingest conformance.

FFV1 archival captures ship in MKV (the preservation-community
pairing); `pipeline/mkv.py` parses EBML directly and reuses avi.py's
codec dispatch.  Conformance: self round trips through write_mkv
(including dropped-frame timestamp gaps), external anchors against
OpenCV's bundled libavcodec in BOTH directions (their muxer+encoders
-> our reader; our muxer+encoders -> their decoder), and full-pipeline
codec transparency."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import avi, ingest, mkv

try:
    import cv2
    HAVE_CV2 = True
except ImportError:
    HAVE_CV2 = False

CODECS = ["FFV1", "HFYU", "ULY0", "LAGS", "Y800"]


def _frames(rng, F=3, H=48, W=64):
    return np.stack([(rng.random((H, W)) > 0.7).astype(np.uint8) * 200
                     for _ in range(F)])


@pytest.mark.parametrize("codec", CODECS)
def test_mkv_round_trip(tmp_path, codec):
    frames = _frames(np.random.default_rng(1))
    p = tmp_path / "t.mkv"
    mkv.write_mkv(p, frames, codec=codec)
    with mkv.MKVReader(p) as rd:
        assert (rd.width, rd.height, rd.n_frames) == (64, 48, 3)
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


@pytest.mark.parametrize("codec", ["FFV1", "HFYU"])
def test_mkv_dropped_frames(tmp_path, codec):
    """Timestamp gaps = dropped slots (black), like AVI's zero-length
    idx1 entries and the .pts sidecar."""
    frames = _frames(np.random.default_rng(2))
    p = tmp_path / "d.mkv"
    mkv.write_mkv(p, frames, codec=codec, drops=[1, 3])
    with mkv.MKVReader(p) as rd:
        assert rd.n_frames == 5 and rd.dropped_frames == 2
        got = rd.read_frames(0, 5)
    np.testing.assert_array_equal(got[0], frames[0])
    assert not got[1].any() and not got[3].any()
    np.testing.assert_array_equal(got[2], frames[1])
    np.testing.assert_array_equal(got[4], frames[2])


def test_open_capture_routes_mkv(tmp_path):
    frames = _frames(np.random.default_rng(3))
    p = tmp_path / "r.mkv"
    mkv.write_mkv(p, frames, codec="FFV1")
    with ingest.open_capture(p) as rd:
        assert isinstance(rd, mkv.MKVReader)
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


def test_unsupported_codec_raises(tmp_path):
    frames = _frames(np.random.default_rng(4), F=1)
    p = tmp_path / "x.mkv"
    mkv.write_mkv(p, frames, codec="FFV1")
    raw = bytearray(p.read_bytes())
    i = raw.find(b"V_FFV1")
    raw[i:i + 6] = b"V_AV1\x00"
    p.write_bytes(bytes(raw))
    with pytest.raises(avi.AVIError, match="V_AV1"):
        mkv.MKVReader(p)


def test_truncated_mkv_raises_at_open(tmp_path):
    """A truncated tail must fail at MKVReader() open (AVIError) so
    the CLI's decodable-input probe can fall back — not explode with
    a bare ValueError mid-decode."""
    frames = _frames(np.random.default_rng(8))
    p = tmp_path / "t.mkv"
    mkv.write_mkv(p, frames, codec="FFV1")
    raw = p.read_bytes()
    for cut in (1, 37, 200):
        q = tmp_path / f"cut{cut}.mkv"
        q.write_bytes(raw[:-cut])
        with pytest.raises(avi.AVIError):
            mkv.MKVReader(q)


def test_write_mkv_payloads_build_extradata(tmp_path):
    """Explicit payloads still get self-describing extradata (shared
    resolve_payloads contract with write_avi)."""
    from sdvpcmdecoder_tpu.pipeline import ffv1 as fv
    frames = _frames(np.random.default_rng(9))
    _, chunks = fv.encode(frames)
    p = tmp_path / "p.mkv"
    mkv.write_mkv(p, frames, codec="FFV1", payloads=chunks)
    with mkv.MKVReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


def test_not_mkv_raises(tmp_path):
    p = tmp_path / "n.mkv"
    p.write_bytes(b"RIFF\x00\x00\x00\x00AVI LIST")
    with pytest.raises(avi.AVIError, match="Matroska"):
        mkv.MKVReader(p)


def test_mkv_full_pipeline_matches_avi(tmp_path):
    """Container transparency: the same FFV1 frames read identically
    from MKV and AVI."""
    frames = _frames(np.random.default_rng(5), H=32, W=96)
    pm = tmp_path / "c.mkv"
    pa = tmp_path / "c.avi"
    mkv.write_mkv(pm, frames, codec="FFV1")
    avi.write_avi(pa, frames, codec="FFV1")
    with ingest.open_capture(pm) as a, ingest.open_capture(pa) as b:
        np.testing.assert_array_equal(a.read_frames(0, 3),
                                      b.read_frames(0, 3))


def test_mkv_cli_decodes(tmp_path):
    """python -m sdvpcmdecoder_tpu on an FFV1-in-MKV capture produces
    the same WAV as the Y800 AVI of identical frames."""
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.synth import encoder as enc
    rng = np.random.default_rng(30)
    lpf, n_frames, width = 294, 2, 1152
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n),
                               n_frames, lines_pf=lpf)
    vids = []
    for fr in frames:
        px, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                 width=width, ppb=8.0)
        L = px.shape[0]
        img = np.zeros((L, width), np.uint8)
        img[0::2] = px[:L // 2]
        img[1::2] = px[L // 2:]
        vids.append(img)
    vids = np.stack(vids)
    pm = tmp_path / "c.mkv"
    pa = tmp_path / "c.avi"
    mkv.write_mkv(pm, vids, codec="FFV1")
    avi.write_avi(pa, vids, codec="Y800")
    om, oa = tmp_path / "m.wav", tmp_path / "a.wav"
    assert main([str(pm), "-o", str(om), "--quality", "fast"]) == 0
    assert main([str(pa), "-o", str(oa), "--quality", "fast"]) == 0
    assert om.read_bytes() == oa.read_bytes()


# -- external anchors ---------------------------------------------------------------

def _cv2_luma(path, F, H, W):
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
@pytest.mark.parametrize("fcc", ["FFV1", "HFYU"])
def test_external_anchor_libav_muxed_mkv_decodes(tmp_path, fcc):
    """Real libavformat-muxed MKV (cv2's writer) with real libavcodec
    encoders -> our reader, bit-exact against their own decode."""
    rng = np.random.default_rng(6)
    H, W, F = 48, 64, 3
    frames = _frames(rng, F=F, H=H, W=W)
    p = str(tmp_path / "libav.mkv")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*fcc), 25, (W, H),
                        False)
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()
    truth = _cv2_luma(p, F, H, W)
    with mkv.MKVReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, F), truth)


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV not available")
@pytest.mark.parametrize("codec", ["FFV1", "HFYU", "ULY0", "LAGS"])
def test_external_anchor_our_mkv_decodes_in_libav(tmp_path, codec):
    frames = _frames(np.random.default_rng(7))
    p = tmp_path / "ours.mkv"
    mkv.write_mkv(p, frames, codec=codec)
    np.testing.assert_array_equal(_cv2_luma(p, 3, 48, 64), frames)
