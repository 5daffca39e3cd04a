"""Every optional decode feature must be reachable from the CLI — the
round-2 review found per-line AGC, SI/EI auto-switch and FFmpeg
auto-transcode implemented but orphaned.  These tests drive each flag
through `main()` end to end.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.__main__ import main
from sdvpcmdecoder_tpu.pipeline import ingest, v2d, wav
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.synth import encoder as enc


def _stc_capture(path, n_frames=2, seed=5):
    rng = np.random.default_rng(seed)
    lpf = 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    vids = []
    for fr in frames:
        px, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                 width=1152, ppb=8.0)
        L = px.shape[0]
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = px[:L // 2]
        img[1::2] = px[L // 2:]
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids))


def test_cli_per_line_agc_flag(tmp_path, monkeypatch):
    """--per-line-agc reaches V2DDriver AND the decode still succeeds
    (the per-line level path runs for every frame)."""
    captured = {}
    orig = v2d.V2DDriver

    class Spy(orig):
        def __init__(self, **kw):
            captured.update(kw)
            super().__init__(**kw)

    monkeypatch.setattr(v2d, "V2DDriver", Spy)
    cap = tmp_path / "c.y4m"
    _stc_capture(cap)
    out = tmp_path / "c.wav"
    rc = main([str(cap), "-o", str(out), "--quality", "fast",
               "--per-line-agc"])
    assert rc == 0
    assert captured["per_line_agc"] is True
    data, _ = wav.read_wav(out)
    assert len(data) > 1000

    rc = main([str(cap), "-o", str(out), "--quality", "fast"])
    assert rc == 0 and captured["per_line_agc"] is False


def test_cli_backend_flag(tmp_path):
    """--backend native and --backend tpu both decode; same WAV bytes
    (the bit-identity contract, here at CLI level)."""
    cap = tmp_path / "c.y4m"
    _stc_capture(cap)
    outs = []
    for be in ("native", "tpu"):
        out = tmp_path / f"{be}.wav"
        rc = main([str(cap), "-o", str(out), "--quality", "fast",
                   "--backend", be])
        assert rc == 0
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_cli_pcm16x0_auto_fmt_wired(tmp_path, monkeypatch):
    """--format pcm16x0 constructs the stitcher with auto_fmt=True
    (SI->EI switch from the control-bit stream); --format pcm1630 pins
    EI without auto."""
    captured = {}
    orig = sp16.PCM16X0Stitcher

    class Spy(orig):
        def __init__(self, **kw):
            captured.update(kw)
            super().__init__(**kw)

    monkeypatch.setattr(sp16, "PCM16X0Stitcher", Spy)
    cap = tmp_path / "c16.y4m"
    # any capture works: construction happens before decode
    ingest.write_y4m(cap, np.zeros((1, 490, 1600), np.uint8),
                     chroma="mono")
    rc = main([str(cap), "-o", str(tmp_path / "o.wav"),
               "--format", "pcm16x0", "--quality", "fast"])
    assert rc == 0
    assert captured["auto_fmt"] is True
    assert captured["fmt"] == sp16.FORMAT_SI
    rc = main([str(cap), "-o", str(tmp_path / "o2.wav"),
               "--format", "pcm1630", "--quality", "fast"])
    assert rc == 0
    assert captured["auto_fmt"] is False
    assert captured["fmt"] == sp16.FORMAT_EI


def test_cli_auto_transcode_invoked(tmp_path, monkeypatch):
    """A non-Y4M input auto-transcodes through the FFmpeg helper and the
    decode proceeds on its output."""
    y4m = tmp_path / "real.y4m"
    _stc_capture(y4m)
    avi = tmp_path / "cap.avi"
    avi.write_bytes(b"RIFFfakeavi")
    calls = {}

    def fake_transcode(src, dst, ffmpeg="ffmpeg"):
        calls["src"] = str(src)
        import shutil
        shutil.copy(y4m, dst)
        return 0

    monkeypatch.setattr(ingest, "transcode_with_ffmpeg", fake_transcode)
    out = tmp_path / "o.wav"
    rc = main([str(avi), "-o", str(out), "--quality", "fast"])
    assert rc == 0
    assert calls["src"] == str(avi)
    data, _ = wav.read_wav(out)
    assert len(data) > 1000


def test_cli_transcode_graceful_without_ffmpeg(tmp_path, monkeypatch):
    """No ffmpeg binary: a clear error and exit code 2, not a traceback
    (this bench host has no ffmpeg at all)."""
    import shutil
    monkeypatch.setattr(shutil, "which", lambda name: None)
    avi = tmp_path / "cap.avi"
    avi.write_bytes(b"RIFFfakeavi")
    rc = main([str(avi), "-o", str(tmp_path / "o.wav")])
    assert rc == 2


def test_cli_backend_device(tmp_path):
    """--backend device routes through the chip-resident drivers and
    produces the same WAV bytes as --backend native, for STC-007 and
    PCM-16x0 alike."""
    from test_batch_driver_formats import _pcm16x0_capture
    cap = tmp_path / "c.y4m"
    _stc_capture(cap, n_frames=4)
    outs = []
    for be in ("native", "device"):
        out = tmp_path / f"{be}.wav"
        rc = main([str(cap), "-o", str(out), "--quality", "fast",
                   "--backend", be])
        assert rc == 0
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    cap16 = tmp_path / "c16.y4m"
    _pcm16x0_capture(cap16, n_frames=3)
    outs = []
    for be in ("native", "device"):
        out = tmp_path / f"p16_{be}.wav"
        rc = main([str(cap16), "-o", str(out), "--quality", "fast",
                   "--format", "pcm16x0", "--backend", be])
        assert rc == 0
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_cli_backend_device_rejects_unsupported(tmp_path, capsys):
    cap = tmp_path / "c.y4m"
    _stc_capture(cap)
    rc = main([str(cap), "-o", str(tmp_path / "o.wav"),
               "--backend", "device", "--cwd"])
    assert rc == 2
    assert "--cwd" in capsys.readouterr().err
