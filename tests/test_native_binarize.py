"""Bit-identity of the native early-exit trial grid vs the XLA grid.

stitch_native.binarize_frames is the HOST twin of
binarize.stc007_frame_decode (readPCMdata trial grid,
binarizer.cpp:7695-8090): same integer-PPB coordinates, Schmitt
hysteresis, CRC gate, lexicographic (hyst, shift) selection and (0,0)
fallback — the XLA path evaluates all trials and argmin-selects, the
native path early-exits like the reference; outputs must be equal.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sdvpcmdecoder_tpu.ops import binarize as bz, stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc
from sdvpcmdecoder_tpu.pipeline import ingest, v2d

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _noisy_batch(seed=7, F=4, Lf=24, W=512, sigma=25.0):
    rng = np.random.default_rng(seed)
    n_lines = F * Lf
    n = 3 * n_lines
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(0, 1 << 14, n), rng.integers(0, 1 << 14, n),
        width=W, ppb=3.5, n_lines=n_lines, noise_sigma=sigma, rng=rng)
    px = pixels.reshape(F, Lf, W)
    cd = coords[::Lf].astype(np.int32)
    ref = rng.integers(80, 140, F).astype(np.int32)
    blk = np.full(F, 20, np.int32)
    wht = np.full(F, 200, np.int32)
    return px, cd, ref, blk, wht


@pytest.mark.parametrize("hl,sl", [(0, 0), (4, 2)])
def test_grid_identity(hl, sl):
    px, cd, ref, blk, wht = _noisy_batch()
    xla = bz.stc007_frame_decode(
        jnp.asarray(px), jnp.asarray(cd), jnp.asarray(ref),
        jnp.asarray(blk), jnp.asarray(wht), hyst_limit=hl, shift_limit=sl)
    w, c, v, h, s = sn.binarize_frames(px, cd, ref, blk, wht, hl, sl)
    assert np.array_equal(np.asarray(xla.valid), v)
    assert np.array_equal(np.asarray(xla.words), w)
    assert np.array_equal(np.asarray(xla.crc_read), c)
    assert np.array_equal(np.asarray(xla.hyst), h.astype(np.int32))
    assert np.array_equal(np.asarray(xla.shift), s.astype(np.int32))
    assert 0.0 < v.mean()  # the noisy batch must exercise both outcomes


def test_grid_identity_per_line_levels():
    px, cd, _, blk, wht = _noisy_batch()
    rng = np.random.default_rng(3)
    F, Lf, _ = px.shape
    refl = rng.integers(80, 140, (F, Lf)).astype(np.int32)
    blk2 = np.broadcast_to(blk[:, None], refl.shape)
    wht2 = np.broadcast_to(wht[:, None], refl.shape)
    xla = bz.stc007_frame_decode(
        jnp.asarray(px), jnp.asarray(cd), jnp.asarray(refl),
        jnp.asarray(blk2), jnp.asarray(wht2), hyst_limit=4, shift_limit=2)
    w, c, v, _, _ = sn.binarize_frames(px, cd, refl, blk2, wht2, 4, 2)
    assert np.array_equal(np.asarray(xla.valid), v)
    assert np.array_equal(np.asarray(xla.words), w)
    assert np.array_equal(np.asarray(xla.crc_read), c)


def test_strided_view_matches_contiguous():
    """The zero-copy mmap-view path (arbitrary row strides) must decode
    identically to a contiguous copy."""
    px, cd, ref, blk, wht = _noisy_batch(F=2, Lf=16)
    F, Lf, W = px.shape
    # interleave rows like a raw frame, then view fields back out
    raw = np.empty((F, Lf, W), np.uint8)
    raw[:, 0::2] = px[:, :Lf // 2]
    raw[:, 1::2] = px[:, Lf // 2:]
    perm, _ = ingest.field_perm(Lf)
    view = raw[:, perm[:Lf // 2] // 1, :]  # strided gather view of field0
    w0, c0, v0, _, _ = sn.binarize_frames(
        np.ascontiguousarray(px), cd, ref, blk, wht, 2, 1)
    w1, c1, v1, _, _ = sn.binarize_frames(raw, cd, ref, blk, wht, 2, 1)
    assert np.array_equal(w1[:, perm], w0)
    assert np.array_equal(c1[:, perm], c0)
    assert np.array_equal(v1[:, perm], v0)


def test_decode_frames_host_matches_tpu_path():
    """V2DDriver.decode_frames_host on the raw-row view == decode_frames
    on the field-split copy, end to end (prescan + grid + fallbacks +
    duplicate detection)."""
    rng = np.random.default_rng(11)
    F, H, W = 3, 48, 1024
    n = 3 * F * H
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(0, 1 << 14, n), rng.integers(0, 1 << 14, n),
        width=W, ppb=7.0, n_lines=F * H, noise_sigma=12.0, rng=rng)
    seq = pixels.reshape(F, H, W)
    perm, _ = ingest.field_perm(H)
    raw = np.empty_like(seq)
    raw[:, perm] = seq      # raw frame whose field order equals seq
    drv_a = v2d.V2DDriver(hyst_limit=2, shift_limit=1)
    drv_b = v2d.V2DDriver(hyst_limit=2, shift_limit=1)
    res_a = drv_a.decode_frames(seq)
    res_b = drv_b.decode_frames_host(raw, perm=perm)
    for ra, rb in zip(res_a, res_b):
        assert (ra is None) == (rb is None)
        if ra is None:
            continue
        assert np.array_equal(ra.words, rb.words)
        assert np.array_equal(ra.crc_read, rb.crc_read)
        assert np.array_equal(ra.valid, rb.valid)
        assert np.array_equal(ra.duplicates, rb.duplicates)
        assert np.array_equal(ra.forced_bad, rb.forced_bad)
        assert ra.coords == rb.coords and ra.ref_level == rb.ref_level


def test_row_map_equals_post_permute():
    """binarize_frames(row_map=perm) == binarize(identity)[:, perm]
    (the decode_prepared_host contract), incl. per-line AGC refs."""
    rng = np.random.default_rng(21)
    F, L, W = 3, 60, 512
    n = 3 * F * L
    px, coords, *_ = enc.encode_stream(
        rng.integers(1, 1 << 14, n), rng.integers(1, 1 << 14, n),
        width=W, ppb=3.5, n_lines=F * L, noise_sigma=8.0, rng=rng)
    pixels = np.ascontiguousarray(px.reshape(F, L, W))
    cds = np.asarray(coords[::L], np.int32).reshape(F, 2)
    perm = np.argsort(rng.random(L))  # arbitrary row permutation
    for refs in (np.full(F, 110, np.int64),
                 rng.integers(100, 120, (F, L))):
        blk = np.full(refs.shape, 20, np.int64)
        wht = np.full(refs.shape, 200, np.int64)
        base = sn.binarize_frames(pixels, cds, refs, blk, wht, 4, 2)
        mapped = sn.binarize_frames(pixels, cds, refs, blk, wht, 4, 2,
                                    row_map=perm)
        for a, b in zip(base[:3], mapped[:3]):
            np.testing.assert_array_equal(np.asarray(a)[:, perm],
                                          np.asarray(b))
