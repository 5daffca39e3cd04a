"""RenderPCM parity for PCM-1 / PCM-16x0 / source views."""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.pipeline import render as rn


def test_pcm1_render_colors():
    rng = np.random.default_rng(0)
    w = rng.integers(0, 1 << 13, size=(4, 6))
    c = np.asarray(pcm1.calc_crc(w, xp=np))
    valid = np.array([True, False, True, True])
    fixed = np.array([False, False, True, False])
    img = rn.render_pcm1_lines(w, c, valid, fixed=fixed)
    assert img.shape == (4, 94 * rn.PPB_PCM1LINE, 3)
    # invalid line red-dominant, valid gray, fixed yellow
    assert img[1, :, 0].max() >= 140 and img[1, :, 1].max() < 130
    assert img[0, :, 0].max() <= 150
    assert (img[2, :, 0].max() >= 127) and (img[2, :, 2].max() == 0)


def test_pcm16x0_render_control_bit_column():
    rng = np.random.default_rng(1)
    w = rng.integers(0, 1 << 16, size=(6, 3))
    c = np.asarray(pcm16x0.calc_crc(w, xp=np))
    cb = np.array([True, False, True, False, True, False])
    img = rn.render_pcm16x0_sublines(w, c, np.ones(6, bool),
                                     control_bit=cb)
    ppb = rn.PPB_PCM16X0LINE
    assert img.shape == (6, 65 * ppb, 3)
    last = img[:, -1, :]
    assert (last[cb] == 255).all()      # set control bit drawn white
    assert (last[~cb] != 255).any()


def test_source_render_shape_and_downscale():
    px = np.arange(256, dtype=np.uint8)[None, :].repeat(10, 0)
    img = rn.render_source_lines(px)
    assert img.shape == (10, 256, 3)
    np.testing.assert_array_equal(img[..., 0], img[..., 2])
    small = rn.render_source_lines(px, max_width=64)
    assert small.shape[1] <= 128


def test_cli_render_dir_pcm1(tmp_path):
    """--render-dir writes frame + source PPMs on the PCM-1 path."""
    import sys
    sys.path.insert(0, str(tmp_path))
    from test_resume_formats import _pcm1_capture  # reuse fixture
    from sdvpcmdecoder_tpu.__main__ import main
    cap = _pcm1_capture(tmp_path, n_frames=1)
    out = tmp_path / "o.wav"
    rd = tmp_path / "ppm"
    assert main([str(cap), "-o", str(out), "--format", "pcm1",
                 "--quality", "fast", "--render-dir", str(rd)]) == 0
    frames = sorted(rd.glob("frame_*.ppm"))
    sources = sorted(rd.glob("source_*.ppm"))
    assert frames and sources
    img = rn.read_ppm(frames[0])
    assert img.shape[0] > 0 and img.shape[2] == 3
