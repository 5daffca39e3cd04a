"""Live audio output (SamplesToAudio analog) + capture selection
(capt_sel analog) — headless, deterministic via injected clock/probe."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import capture, live_audio as la


def _pairs(n, base=0):
    v = np.arange(base, base + n, dtype=np.int16)
    return np.stack([v, -v], axis=1)


def test_paced_pump_writes_due_samples():
    sink = la.CaptureSink()
    s2a = la.SamplesToAudio(sink, rate=1000, clock=lambda: 0.0)
    s2a.prepare()
    s2a.save_audio(_pairs(500))
    assert s2a.pump_once(now=0.0) == 0          # nothing due yet
    assert s2a.pump_once(now=0.1) == 100        # 100 pairs due @1kHz
    assert s2a.pump_once(now=0.25) == 150
    got = np.frombuffer(sink.data(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got, _pairs(250))
    assert s2a.underrun_pairs == 0


def test_underrun_fills_silence_and_keeps_clock():
    sink = la.CaptureSink()
    s2a = la.SamplesToAudio(sink, rate=1000, clock=lambda: 0.0)
    s2a.prepare()
    s2a.save_audio(_pairs(50))
    s2a.pump_once(now=0.1)                      # 100 due, 50 available
    assert s2a.underrun_pairs == 50
    got = np.frombuffer(sink.data(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got[:50], _pairs(50))
    assert not got[50:].any()
    # Later data stays in sync: only newly due pairs are written.
    s2a.save_audio(_pairs(100, base=50))
    assert s2a.pump_once(now=0.15) == 50


def test_ring_overflow_drops_oldest():
    sink = la.CaptureSink()
    s2a = la.SamplesToAudio(sink, rate=1000, clock=lambda: 0.0,
                            buf_pairs=64)
    s2a.prepare()
    s2a.save_audio(_pairs(64))
    s2a.save_audio(_pairs(32, base=100))
    assert s2a.overrun_pairs == 32
    s2a.pump_once(now=1.0)
    got = np.frombuffer(sink.data(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got[:32], _pairs(64)[32:])
    np.testing.assert_array_equal(got[32:64], _pairs(32, base=100))


def test_sink_backpressure_requeues():
    sink = la.CaptureSink(accept=40)            # 10 pairs per write
    s2a = la.SamplesToAudio(sink, rate=1000, clock=lambda: 0.0)
    s2a.prepare()
    s2a.save_audio(_pairs(30))
    assert s2a.pump_once(now=0.03) == 10
    assert s2a.count == 20                      # remainder requeued
    assert s2a.pump_once(now=0.03) == 10        # timer retry drains more
    assert s2a.pump_once(now=0.03) == 10
    assert s2a.pump_once(now=0.03) == 0         # all due pairs written
    got = np.frombuffer(sink.data(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got, _pairs(30))
    assert s2a.underrun_pairs == 0


def test_stop_output_drains():
    sink = la.CaptureSink()
    s2a = la.SamplesToAudio(sink, rate=1000, clock=lambda: 0.0)
    s2a.prepare()
    s2a.save_audio(_pairs(77))
    s2a.stop_output()
    got = np.frombuffer(sink.data(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got, _pairs(77))
    assert sink.closed


def test_fd_sink_and_make_sink(tmp_path):
    p = tmp_path / "live.raw"
    sink = la.make_sink(str(p))
    assert isinstance(sink, la.FDSink)
    sink.open(44100)
    sink.write(b"\x01\x02\x03\x04")
    sink.close()
    assert p.read_bytes() == b"\x01\x02\x03\x04"


def test_alsa_sink_gated():
    with pytest.raises(OSError):
        la.ALSASink()   # no libasound on this host


def test_cli_live_audio_tee(tmp_path):
    """--live-audio PATH: raw s16le stream matches the WAV payload."""
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.formats import pcm1
    from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
    from sdvpcmdecoder_tpu.pipeline import ingest, stitcher_pcm1 as sp1
    from sdvpcmdecoder_tpu.pipeline import wav
    from sdvpcmdecoder_tpu.synth import encoder as enc

    rng = np.random.default_rng(9)
    W = 1024
    img_frames = []
    for f in range(2):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            sl, sr = di1.interleave_field(
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES),
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES))
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        img_frames.append(img)
    cap = tmp_path / "p1.y4m"
    out = tmp_path / "p1.wav"
    rawp = tmp_path / "live.raw"
    ingest.write_y4m(cap, np.stack(img_frames), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "pcm1",
               "--quality", "fast", "--live-audio", str(rawp)])
    assert rc == 0
    data, rate = wav.read_wav(out)
    live = np.frombuffer(rawp.read_bytes(), "<i2").reshape(-1, 2)
    # The pump may pad trailing silence for pacing; the decoded payload
    # must be a prefix-aligned match.
    assert len(live) >= len(data)
    np.testing.assert_array_equal(live[:len(data)], data)
    assert not live[len(data):].any()


# -- capture selection ----------------------------------------------------

def _fake_probe(devs):
    def probe(path):
        if path in devs:
            name, caps = devs[path]
            return capture.CaptureDevice(path=path, card=name,
                                         driver="fake",
                                         capabilities=caps)
        return None
    return probe


def test_enumerate_filters_capture_capable(tmp_path):
    d = tmp_path / "video0"
    d2 = tmp_path / "video1"
    d.touch(), d2.touch()
    devs = {str(d): ("capA", 0x1), str(d2): ("out-only", 0x0)}
    got = capture.enumerate_devices(str(tmp_path / "video*"),
                                    probe=_fake_probe(devs))
    assert [x.card for x in got] == ["capA"]


def test_selector_flow(tmp_path):
    d = tmp_path / "video0"
    d.touch()
    devs = {str(d): ("capA", 0x1)}
    sel = capture.CaptureSelector(
        lambda: capture.enumerate_devices(str(tmp_path / "video*"),
                                          probe=_fake_probe(devs)))
    with pytest.raises(ValueError):
        sel.save()                       # nothing selected yet
    sel.refresh()
    sel.select(0)
    sel.set_ntsc()
    sel.set_color(capture.COLOR_G)
    sel.set_offset(8, 4)
    cfg = sel.save()
    assert cfg.device == str(d)
    assert (cfg.width, cfg.height, cfg.fps) == (720, 480, 30)
    assert cfg.color == capture.COLOR_G
    assert cfg.offset == (8, 4)
    sel.set_pal()
    assert (sel.config.width, sel.config.height) == (720, 576)
    # Device vanishes -> refresh clears the selection.
    devs.clear()
    sel.refresh()
    with pytest.raises(ValueError):
        sel.save()


def test_selector_select_missing_raises():
    sel = capture.CaptureSelector(lambda: [])
    sel.refresh()
    with pytest.raises(ValueError, match="no capture device"):
        sel.select("/dev/video9")


def test_probe_real_host_is_safe():
    # This host has no /dev/video*: both paths must degrade cleanly.
    assert capture._probe_v4l2("/nonexistent/video0") is None
    assert capture.enumerate_devices() == []
