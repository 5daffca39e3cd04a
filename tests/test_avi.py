"""In-process AVI container ingest (pipeline/avi.py).

The reference opens captures through libav (ffmpegwrapper.cpp:543);
here VirtualDub-style AVIs decode in-process, with zero-length idx1
entries (the dropped-frame convention) mapping to all-black timeline
slots exactly like the `.pts` sidecar path.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import avi, ingest


def _frames(F=5, H=32, W=48, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(F, H, W)).astype(np.uint8)


@pytest.mark.parametrize("codec", ["Y800", "YUY2", "UYVY", "DIB"])
def test_roundtrip_lossless(tmp_path, codec):
    frames = _frames()
    p = tmp_path / f"cap_{codec}.avi"
    avi.write_avi(p, frames, codec=codec)
    with avi.AVIReader(p) as rd:
        assert (rd.width, rd.height) == (48, 32)
        assert rd.n_frames == 5
        assert rd.dropped_frames == 0
        got = rd.read_frames(0, 5)
    np.testing.assert_array_equal(got, frames)


def test_roundtrip_mjpeg(tmp_path):
    pytest.importorskip("PIL")
    # Flat fields survive JPEG closely; verify approximate luma.
    frames = np.full((3, 32, 48), 0, np.uint8)
    frames[0] += 30
    frames[1] += 128
    frames[2] += 220
    p = tmp_path / "cap_mjpg.avi"
    avi.write_avi(p, frames, codec="MJPG", quality=95)
    with avi.AVIReader(p) as rd:
        got = rd.read_frames(0, 3)
    assert np.abs(got.astype(int) - frames.astype(int)).max() <= 4


def test_dropped_frames_from_idx1(tmp_path):
    frames = _frames(F=4)
    p = tmp_path / "drops.avi"
    # timeline: s0 _ s1 s2 _ s3  (slots 1 and 4 dropped)
    avi.write_avi(p, frames, codec="Y800", drops=[1, 4])
    with avi.AVIReader(p) as rd:
        assert rd.n_frames == 6
        assert rd.dropped_frames == 2
        got = rd.read_frames(0, 6)
    np.testing.assert_array_equal(got[0], frames[0])
    assert not got[1].any()
    np.testing.assert_array_equal(got[2], frames[1])
    np.testing.assert_array_equal(got[3], frames[2])
    assert not got[4].any()
    np.testing.assert_array_equal(got[5], frames[3])


def test_partial_reads_and_view(tmp_path):
    frames = _frames(F=6)
    p = tmp_path / "part.avi"
    avi.write_avi(p, frames, codec="Y800")
    with avi.AVIReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(2, 3), frames[2:5])
        np.testing.assert_array_equal(rd.read_frames_view(4, 10),
                                      frames[4:6])
        assert rd.read_frames(6, 4).shape == (0, 32, 48)


def test_open_capture_routes_avi(tmp_path):
    frames = _frames(F=2)
    p = tmp_path / "route.avi"
    avi.write_avi(p, frames, codec="Y800")
    with ingest.open_capture(p) as rd:
        assert isinstance(rd, avi.AVIReader)
        np.testing.assert_array_equal(rd.read_frames(0, 2), frames)


def test_unsupported_codec_raises(tmp_path):
    frames = _frames(F=2)
    p = tmp_path / "x.avi"
    avi.write_avi(p, frames, codec="Y800")
    raw = bytearray(p.read_bytes())
    i = raw.find(b"Y800")          # strh fccHandler
    j = raw.find(b"Y800", i + 1)   # strf biCompression
    raw[i:i + 4] = b"CVID"         # Cinepak: genuinely unsupported
    raw[j:j + 4] = b"CVID"
    p.write_bytes(bytes(raw))
    with pytest.raises(avi.AVIError, match="CVID"):
        avi.AVIReader(p)


def test_hfyu_round_trip(tmp_path):
    """In-process HuffYUV (ffmpegwrapper.cpp:543 parity): write_avi's
    HFYU encoder -> AVIReader decodes bit-exact luma, via the native
    core AND the Python fallback."""
    import os
    from sdvpcmdecoder_tpu.pipeline import huffyuv as hf
    rng = np.random.default_rng(5)
    frames = np.clip(rng.normal(60, 25, (3, 24, 64)), 0,
                     255).astype(np.uint8)
    frames[:, :, 30:50] = 190      # PCM-ish bright band
    p = tmp_path / "h.avi"
    avi.write_avi(p, frames, codec="HFYU")
    with avi.AVIReader(p) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)
    # Python fallback decodes the same bytes identically
    extra, payloads = hf.encode(frames)
    lens3 = hf.parse_extradata(extra)
    got = hf._decode_frame_py(payloads[1], 64, 24, lens3)
    np.testing.assert_array_equal(got, frames[1])


def test_hfyu_capture_decodes_like_uncompressed(tmp_path):
    """A real PCM capture wrapped in HuffYUV produces the same WAV as
    the same frames wrapped uncompressed (full-pipeline parity for the
    in-process codec)."""
    import os
    from sdvpcmdecoder_tpu.pipeline import batch_driver
    from sdvpcmdecoder_tpu.synth import encoder as enc
    rng = np.random.default_rng(11)
    lpf, W, nf = 294, 1152, 6
    n = 3 * nf * 2 * lpf
    fr = enc.encode_fields(rng.integers(1, 1 << 14, n),
                           rng.integers(1, 1 << 14, n), nf, lines_pf=lpf)
    vids = []
    for f in fr:
        px, _ = enc.render_lines(f["line_words"], f["crcs"], width=W,
                                 ppb=8.0)
        L = px.shape[0]
        img = np.zeros((L, W), np.uint8)
        img[0::2] = px[:L // 2]
        img[1::2] = px[L // 2:]
        vids.append(img)
    vids = np.stack(vids)
    wavs = {}
    for codec in ("Y800", "HFYU"):
        p = tmp_path / f"c_{codec}.avi"
        avi.write_avi(p, vids, codec=codec)
        out = tmp_path / f"o_{codec}.wav"
        dec = batch_driver.BatchDecoder([(str(p), str(out))],
                                        lines_per_field=lpf,
                                        hyst_limit=2, shift_limit=1)
        dec.run()
        wavs[codec] = out.read_bytes()
    assert wavs["HFYU"] == wavs["Y800"] and len(wavs["Y800"]) > 1000


def test_hfyu_unsupported_predictor_raises(tmp_path):
    frames = _frames(F=2)
    p = tmp_path / "m.avi"
    avi.write_avi(p, frames, codec="HFYU")
    raw = bytearray(p.read_bytes())
    i = raw.find(b"strf")
    # method byte = extradata[0] = strf body offset 40
    raw[i + 8 + 40] = 2            # "median" predictor: out of scope
    p.write_bytes(bytes(raw))
    with pytest.raises(avi.AVIError, match="predictor"):
        avi.AVIReader(p)


def test_not_an_avi(tmp_path):
    p = tmp_path / "bogus.avi"
    p.write_bytes(b"not a riff file at all")
    with pytest.raises(avi.AVIError):
        avi.AVIReader(p)


def test_opendml_avix_segments(tmp_path):
    """OpenDML file: standard indx covering frames in BOTH the main
    'AVI ' segment and an 'AVIX' extension segment, plus the legacy
    idx1 that only covers segment 1.  The indx must win — frames in the
    AVIX tail must not vanish (regression: idx1 used to clobber it)."""
    import struct as st
    H = W = 8
    frames = _frames(F=4, H=H, W=W, seed=5)
    payloads = [frames[i].tobytes() for i in range(4)]

    def chunk(ckid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + st.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    strh = (b"vids" + b"Y800" + b"\x00" * 12 + st.pack("<II", 1, 25)
            + st.pack("<III", 0, 4, 0) + st.pack("<i", -1)
            + st.pack("<I", 0) + st.pack("<4H", 0, 0, W, H))
    strf = st.pack("<IiiHH4sIiiII", 40, W, H, 1, 8, b"Y800",
                   W * H, 0, 0, 0, 0)
    avih = st.pack("<14I", 40000, 0, 0, 0x10, 4, 0, 1, 0, W, H,
                   0, 0, 0, 0)
    indx_body_placeholder = (st.pack("<HBB", 2, 0, 0x01)
                             + st.pack("<I", 4) + b"00dc"
                             + st.pack("<Q", 0) + st.pack("<I", 0)
                             + b"\x00" * (8 * 4))
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)
                     + chunk(b"indx", indx_body_placeholder)))
    movi1 = b"movi" + chunk(b"00dc", payloads[0]) \
        + chunk(b"00dc", payloads[1])
    movi2 = b"movi" + chunk(b"00dc", payloads[2]) \
        + chunk(b"00dc", payloads[3])
    # legacy idx1: only segment-1 frames (offsets rel. to movi fourcc)
    idx1 = (b"00dc" + st.pack("<III", 0x10, 4, len(payloads[0]))
            + b"00dc" + st.pack("<III", 0x10,
                                4 + 8 + len(payloads[0]),
                                len(payloads[1])))
    seg1_body = hdrl + lst(b"movi", movi1[4:]) + chunk(b"idx1", idx1)
    seg2_body = lst(b"movi", movi2[4:])
    raw = bytearray(b"RIFF" + st.pack("<I", 4 + len(seg1_body))
                    + b"AVI " + seg1_body
                    + b"RIFF" + st.pack("<I", 4 + len(seg2_body))
                    + b"AVIX" + seg2_body)
    # Patch absolute data offsets into the indx entries.
    data_offsets = []
    pos = 0
    while True:
        pos = raw.find(b"00dc", pos)
        if pos < 0 or pos + 8 > len(raw):
            break
        size = st.unpack_from("<I", raw, pos + 4)[0]
        if size == W * H:   # movi data chunks only (idx1 rows differ)
            data_offsets.append(pos + 8)
        pos += 4
    assert len(data_offsets) == 4, data_offsets
    indx_pos = raw.find(b"indx") + 8 + 24
    for k, o in enumerate(data_offsets):
        st.pack_into("<II", raw, indx_pos + 8 * k, o, W * H)
    p = tmp_path / "odml.avi"
    p.write_bytes(bytes(raw))
    with avi.AVIReader(p) as rd:
        assert rd.n_frames == 4, rd.n_frames
        got = rd.read_frames(0, 4)
    np.testing.assert_array_equal(got, frames)


def test_cli_decodes_pcm1_from_avi(tmp_path):
    """Full pipeline over an AVI capture: PCM-1 in a Y800 AVI with one
    dropped frame slot -> decoded WAV (drop handled as a dummy frame)."""
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.formats import pcm1
    from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1, wav
    from sdvpcmdecoder_tpu.synth import encoder as enc

    rng = np.random.default_rng(77)
    W = 1024
    n_frames = 3
    n = n_frames * 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            base = (f * 2 + half) * di1.FIELD_SUBLINES
            sl, sr = di1.interleave_field(
                left[base:base + di1.FIELD_SUBLINES],
                right[base:base + di1.FIELD_SUBLINES])
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    cap = tmp_path / "p1.avi"
    out = tmp_path / "p1.wav"
    avi.write_avi(cap, np.stack(vids), codec="Y800")
    rc = main([str(cap), "-o", str(out), "--format", "pcm1",
               "--quality", "fast"])
    assert rc == 0
    data, rate = wav.read_wav(out)
    el = np.asarray(pcm1.expand_sample(left, xp=np)).astype(np.int64)
    np.testing.assert_array_equal(data[:, 0].astype(np.int64), el)


def test_truncation_and_corruption_fuzz(tmp_path):
    """Truncated or bit-flipped containers must raise a clean error (or
    decode what remains) — never crash, hang, or return garbage shapes.
    Production captures arrive damaged; the reference surfaces libav
    errors as dialogs (ffmpegwrapper.h:91-111), we surface exceptions."""
    frames = _frames(F=6)
    p = tmp_path / "whole.avi"
    avi.write_avi(str(p), frames, codec="Y800")
    blob = p.read_bytes()
    rng = np.random.default_rng(8)
    for trial in range(12):
        cut = int(rng.integers(4, len(blob)))
        bad = bytearray(blob[:cut])
        if trial % 2 and len(bad) > 64:
            for _ in range(4):  # flip a few header-region bytes too
                bad[int(rng.integers(0, min(len(bad), 256)))] ^= 0xFF
        q = tmp_path / f"bad_{trial}.avi"
        q.write_bytes(bytes(bad))
        try:
            with avi.AVIReader(str(q)) as rd:
                got = rd.read_frames(0, rd.n_frames)
                assert got.ndim == 3
                assert got.shape[2] == rd.width
        except (avi.AVIError, ValueError, OSError, EOFError):
            pass  # clean refusal is the contract


def test_truncated_y4m_clean_error(tmp_path):
    frames = _frames(F=4)
    p = tmp_path / "whole.y4m"
    ingest.write_y4m(str(p), frames)
    blob = p.read_bytes()
    for cut in (3, 17, len(blob) // 2, len(blob) - 5):
        q = tmp_path / f"cut_{cut}.y4m"
        q.write_bytes(blob[:cut])
        try:
            with ingest.open_capture(str(q)) as rd:
                got = rd.read_frames(0, rd.n_frames)
                assert got.ndim == 3
        except (ValueError, OSError, EOFError, AssertionError):
            pass
