"""AGC histogram B&W detection + STC-007 marker search tests."""
import numpy as np

from sdvpcmdecoder_tpu.ops import agc, markers, binarize as bz
from sdvpcmdecoder_tpu.synth import encoder as enc
import jax.numpy as jnp


def _synth(n=40, seed=0, noise=0.0, **kw):
    rng = np.random.default_rng(seed)
    n_samp = 3 * (n + 120)
    left = rng.integers(1, 1 << 14, size=n_samp)
    right = rng.integers(1, 1 << 14, size=n_samp)
    pixels, coords, lw, crcs = enc.encode_stream(
        left, right, width=1152, ppb=8.0, n_lines=n, noise_sigma=noise,
        rng=rng, **kw)
    return pixels, coords, lw, crcs


def test_agc_finds_levels_clean():
    pixels, *_ = _synth(30, black=22, white=197)
    black, white, ok = agc.find_black_white(pixels)
    assert ok.all()
    assert (np.abs(black - 22) <= 2).all()
    assert (np.abs(white - 197) <= 2).all()


def test_agc_finds_levels_noisy():
    pixels, *_ = _synth(30, noise=12.0, black=30, white=190)
    black, white, ok = agc.find_black_white(pixels)
    assert ok.mean() > 0.9
    assert (np.abs(black[ok] - 30) <= 12).all()
    assert (np.abs(white[ok] - 190) <= 16).all()


def test_agc_rejects_flat_line():
    pixels = np.full((4, 1152), 40, dtype=np.uint8)
    black, white, ok = agc.find_black_white(pixels)
    assert not ok.any()


def test_markers_locate_coords():
    pixels, coords, lw, crcs = _synth(30)
    ref = np.full(pixels.shape[0], 110)
    res = markers.search_markers(pixels, ref)
    assert res.start_found.all()
    assert res.stop_found.all()
    # Analytic coords: data_start = 32+8, data_stop = 32+133*8.
    np.testing.assert_allclose(res.data_start, coords[:, 0], atol=1)
    np.testing.assert_allclose(res.data_stop, coords[:, 1], atol=1)


def test_markers_derived_coords_decode():
    """Lines must decode with marker-derived coordinates end-to-end."""
    pixels, coords, lw, crcs = _synth(40, seed=3)
    ref = np.full(pixels.shape[0], 110)
    res = markers.search_markers(pixels, ref)
    ds, de, ok = markers.coords_from_markers(res)
    assert ok.all()
    mcoords = np.stack([ds, de], axis=-1)
    N = pixels.shape[0]
    words, crc_read, crc_calc, synd, valid = bz.stc007_line_decode(
        jnp.asarray(pixels), jnp.asarray(mcoords, jnp.int32),
        jnp.full((N,), 110, jnp.int32), jnp.full((N,), 20, jnp.int32),
        jnp.full((N,), 200, jnp.int32), 0, 0)
    assert bool(jnp.all(valid)), f"{int(jnp.sum(valid))}/{N}"
    np.testing.assert_array_equal(np.asarray(words), lw)


def test_markers_absent_on_noise():
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 40, size=(8, 1152)).astype(np.uint8)
    res = markers.search_markers(pixels, np.full(8, 110))
    assert not (res.start_found & res.stop_found).any()


def test_native_region_hist_matches_numpy():
    """agc_region_hist == the numpy masked-bincount formulation,
    including overlapping/clamped/empty spans."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    if not sn.available():
        import pytest
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(5)
    N, W = 13, 300
    px = rng.integers(0, 256, (N, W)).astype(np.uint8)
    lo1 = rng.integers(-5, W, N)
    hi1 = lo1 + rng.integers(0, 150, N)
    lo2 = rng.integers(0, W, N)
    hi2 = lo2 + rng.integers(-10, 200, N)   # some empty spans
    for spans in ([(lo1, hi1)], [(lo1, hi1), (lo2, hi2)],
                  [(10, 60), (40, W + 20)]):   # scalars + overlap + clamp
        ref = np.zeros((N, W), bool)
        idx = np.arange(W)[None, :]
        for lo, hi in spans:
            lo = np.broadcast_to(np.asarray(lo, np.int64), (N,))
            hi = np.broadcast_to(np.asarray(hi, np.int64), (N,))
            ref |= (idx >= lo[:, None]) & (idx < hi[:, None])
        ids = ((np.arange(N)[:, None] << 8) | px)[ref]
        want = np.bincount(ids, minlength=N * 256).reshape(N, 256)
        got = sn.region_hist(px, spans)
        np.testing.assert_array_equal(got, want, err_msg=str(len(spans)))
