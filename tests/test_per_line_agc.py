"""Per-line AGC (format-aware findSTC007BW scan regions) decodes captures
with per-line brightness drift that defeat frame-level AGC.

Reference: per-line histogram AGC in processLine (findBlackWhite
binarizer.cpp:3116 runs per line); the repo's fast path uses one
frame-level black/white — per_line_agc=True restores per-line levels.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import agc
from sdvpcmdecoder_tpu.pipeline import v2d
from sdvpcmdecoder_tpu.synth import encoder as enc


PRESET = agc.BinPreset(min_white_lvl=100, max_black_lvl=130)


def _ramp_capture(n_lines=64, width=1152):
    """Noisy capture with a brightness staircase: every line's optimal
    reference level drifts by ~105 levels across the frame, while the
    noise makes any fixed frame-level reference misread one end of the
    ramp (a real capture's AGC pumping / head-switch shading)."""
    rng = np.random.default_rng(3)
    n = 3 * n_lines
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    pixels, coords, words, crcs = enc.encode_stream(
        left, right, width=width, ppb=8.0, n_lines=n_lines,
        noise_sigma=0.0)
    i = np.arange(n_lines)[:, None].astype(np.float64)
    offset = 105.0 * i / n_lines
    drift = pixels.astype(np.float64) * 0.6 + offset
    drift += rng.normal(0.0, 12.0, size=drift.shape)
    return (np.clip(np.round(drift), 0, 255).astype(np.uint8), coords,
            words, crcs)


def test_per_line_bw_tracks_ramp():
    pixels, coords, words, crcs = _ramp_capture()
    blk, wht, ok = agc.find_black_white(pixels, PRESET, fmt="stc007",
                                        ppb=8)
    assert ok.all()
    # black/white must follow the offset ramp upward (~+105)
    assert blk[-1] > blk[0] + 70
    assert wht[-1] > wht[0] + 70


def test_per_line_agc_decodes_ramp_frame_agc_misses():
    pixels, coords, words, crcs = _ramp_capture()
    frame = pixels[None]  # [1, L, W]

    base = v2d.V2DDriver(hyst_limit=1, shift_limit=1, preset=PRESET)
    res_base = base.decode_frames(frame)[0]
    per_line = v2d.V2DDriver(hyst_limit=1, shift_limit=1, preset=PRESET,
                             per_line_agc=True)
    res_pl = per_line.decode_frames(frame)[0]

    n_base = int(res_base.valid.sum()) if res_base else 0
    assert res_pl is not None
    n_pl = int(res_pl.valid.sum())
    # Per-line AGC recovers every line bit-exact; frame-level misses many.
    assert n_pl == len(crcs)
    np.testing.assert_array_equal(res_pl.words, words)
    assert n_base < n_pl


def test_per_line_agc_matches_frame_agc_on_clean():
    rng = np.random.default_rng(4)
    n_lines = 64
    n = 3 * n_lines
    pixels, coords, words, crcs = enc.encode_stream(
        rng.integers(1, 1 << 14, n), rng.integers(1, 1 << 14, n),
        width=1152, ppb=8.0, n_lines=n_lines)
    frame = pixels[None]
    a = v2d.V2DDriver(hyst_limit=1, shift_limit=1).decode_frames(frame)[0]
    b = v2d.V2DDriver(hyst_limit=1, shift_limit=1,
                      per_line_agc=True).decode_frames(frame)[0]
    np.testing.assert_array_equal(a.words, b.words)
    np.testing.assert_array_equal(a.valid, b.valid)
    assert a.valid.all()
