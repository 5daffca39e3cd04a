"""Reference-level sweep (INSANE mode): device sweep + CRC-stats pick."""
import numpy as np
import jax.numpy as jnp

from sdvpcmdecoder_tpu.ops import binarize as bz
from sdvpcmdecoder_tpu.ops import agc
from sdvpcmdecoder_tpu.pipeline import v2d
from sdvpcmdecoder_tpu.synth import encoder as enc


def _dim_lines(n_lines, width=1152, black=5, white=60, seed=3):
    rng = np.random.default_rng(seed)
    left = rng.integers(1, 1 << 14, size=3 * n_lines)
    right = rng.integers(1, 1 << 14, size=3 * n_lines)
    px, coords, words, crcs = enc.encode_stream(
        left, right, width=width, ppb=8.0, n_lines=n_lines,
        black=black, white=white)
    return px, coords, words


def test_sweep_recovers_dim_signal():
    """Signal at 5..60 brightness: the center of a (0, 255) B&W guess
    fails, the sweep finds the working band and the stats pick the
    middle of it."""
    L = 16
    px, coords, words = _dim_lines(L)
    levels = np.arange(254, 1, -4, dtype=np.int32)
    sw = bz.stc007_ref_sweep_decode(
        jnp.asarray(px[None]),
        jnp.asarray(coords[:1], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([255], jnp.int32),
        jnp.asarray(levels), hyst_limit=2, shift_limit=1)
    R = len(levels)
    sv = np.asarray(sw["valid"]).reshape(R, L)
    pick, good, fbad = bz.pick_ref_sweep(
        sv, np.asarray(sw["crc"]).reshape(R, L),
        np.asarray(sw["hyst"]).reshape(R, L),
        np.asarray(sw["shift"]).reshape(R, L))
    assert (pick >= 0).all()
    assert good.all() and not fbad.any()
    # Picked level sits inside the signal band.
    assert ((levels[pick] > 5) & (levels[pick] < 60)).all()
    sw_words = np.asarray(sw["words"]).reshape(R, L, 8)
    got = sw_words[pick, np.arange(L)]
    np.testing.assert_array_equal(got, words)
    # Center ref level 127 must NOT be a valid level (the fast path
    # would have failed) - that's what makes the sweep worth running.
    mid = int(np.argmin(np.abs(levels - 127)))
    assert not sv[mid].any()


def test_pick_ref_sweep_collision_and_narrow():
    """Fabricated stats: a lone CRC collision loses to the frequent CRC;
    a narrow span is picked but flagged forced-bad."""
    R, N = 12, 2
    valid = np.zeros((R, N), bool)
    crc = np.zeros((R, N), np.int64)
    hyst = np.zeros((R, N), np.int64)
    shift = np.zeros((R, N), np.int64)
    # Line 0: levels 1-2 hit collision 0xAAAA, levels 4-9 agree on 0x1234
    # with depth 0 in 5..8 (longest run) and depth 1 at 4 and 9.
    valid[1:3, 0] = True
    crc[1:3, 0] = 0xAAAA
    valid[4:10, 0] = True
    crc[4:10, 0] = 0x1234
    hyst[4, 0] = hyst[9, 0] = 1
    # Line 1: only 3 agreeing levels -> span too narrow (min 5).
    valid[5:8, 1] = True
    crc[5:8, 1] = 0x7777
    pick, good, fbad = bz.pick_ref_sweep(valid, crc, hyst, shift)
    assert crc[pick[0], 0] == 0x1234
    assert pick[0] == 6  # middle of the depth-0 run 5..8
    assert good[0] and not fbad[0]
    assert pick[1] == 6 and not good[1] and fbad[1]


def test_v2d_insane_frame():
    """Driver integration: ref_sweep=True decodes a frame end to end
    (sweep result overrides the fast path) and flags nothing
    forced-bad on clean input."""
    L = 32
    px, coords, words = _dim_lines(L, black=20, white=200, seed=7)
    drv = v2d.V2DDriver(hyst_limit=2, shift_limit=1, ref_sweep=True)
    res = drv.decode_frame(px)
    assert res is not None
    assert res.valid.all()
    np.testing.assert_array_equal(res.words, words)
    assert not res.forced_bad.any()


def test_forced_coordinates():
    """--force-coords analog: marker zones destroyed, decode must still
    work at the forced coordinates and fail without them."""
    L = 16
    rng = np.random.default_rng(12)
    left = rng.integers(1, 1 << 14, size=3 * L)
    right = rng.integers(1, 1 << 14, size=3 * L)
    px, coords, words, crcs = enc.encode_stream(
        left, right, width=1152, ppb=8.0, n_lines=L)
    px = px.copy()
    px[:, :60] = 20     # wipe START marker zone
    px[:, 1100:] = 20   # wipe STOP marker zone
    ds, de = int(coords[0, 0]), int(coords[0, 1])
    drv = v2d.V2DDriver(hyst_limit=2, shift_limit=1,
                        forced_coords=(ds, de))
    res = drv.decode_frame(px)
    assert res is not None
    assert res.valid.all()
    np.testing.assert_array_equal(res.words, words)
    # Without forcing, marker search cannot find coordinates.
    drv2 = v2d.V2DDriver(hyst_limit=2, shift_limit=1)
    res2 = drv2.decode_frame(px)
    assert res2 is None or not res2.valid.any()


def test_sweep_fallback_recovers_dim_lines():
    """NORMAL mode: lines too dim for the frame reference level get the
    per-line sweep fallback (the reference sweeps STC-007 at NORMAL)."""
    L = 24
    rng = np.random.default_rng(23)
    left = rng.integers(1, 1 << 14, size=3 * L)
    right = rng.integers(1, 1 << 14, size=3 * L)
    px, coords, words, crcs = enc.encode_stream(
        left, right, width=1152, ppb=8.0, n_lines=L)
    # Dim a few lines far below the frame's reference level.
    dim = [5, 11, 17]
    pxd = px.astype(np.float64)
    pxd[dim] = 5 + (pxd[dim] - 20) * (60 - 5) / (200 - 20)
    pxd = np.clip(pxd, 0, 255).astype(np.uint8)
    # The sweep is AGC-gated like the reference (processLine
    # binarizer.cpp:1090-1101 only sweeps lines with valid black/white):
    # dim lines (white ~60 < min_white_lvl 132) need the user preset
    # loosened, exactly as the reference's fine_bin_set would.
    dim_preset = agc.BinPreset(min_white_lvl=40, max_black_lvl=30)
    drv = v2d.V2DDriver(hyst_limit=2, shift_limit=1,
                        ref_sweep_fallback=True, preset=dim_preset)
    res = drv.decode_frame(pxd)
    assert res is not None
    assert res.valid.all(), np.nonzero(~res.valid)[0]
    np.testing.assert_array_equal(res.words, words)
    # With the DEFAULT preset the dim lines fail AGC and the sweep is
    # skipped (no 64-level burn on hopeless lines).
    drv1 = v2d.V2DDriver(hyst_limit=2, shift_limit=1,
                         ref_sweep_fallback=True)
    res1 = drv1.decode_frame(pxd)
    assert not res1.valid[dim].any()
    # Without the fallback the dim lines stay invalid.
    drv2 = v2d.V2DDriver(hyst_limit=2, shift_limit=1, preset=dim_preset)
    res2 = drv2.decode_frame(pxd)
    assert not res2.valid[dim].any()
