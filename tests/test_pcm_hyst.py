"""Hysteresis depth sweep for PCM-1 / PCM-16x0 (VERDICT r3 item 4).

The reference applies the hysteresis depth sweep to EVERY format —
readPCMdata (binarizer.cpp:7695) is the shared read path and the depth
limits live on the base binarizer (binarizer.h:235-241) — so PCM-1 and
PCM-16x0 recovery on noisy tapes must improve with depth exactly like
STC-007.  Pins:

  * XLA trial grid == native early-exit twin at depth > 0 (identity);
  * measurable recovery gain at depth 4 over depth 0 at a noise level
    chosen to leave headroom, with ZERO false positives (every
    CRC-valid line decodes bit-exact);
  * PCMFrameDriver plumbs hyst_limit through both backends.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import binarize as bz, stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc

W1, W16 = 1024, 1600
PPB1, PPB16 = 10.0, 7.0


def _pcm1_frames(F=2, L=64, sigma=0.0, seed=5):
    rng = np.random.default_rng(seed)
    words = rng.integers(0, 1 << 13, (F * L, 6))
    crcs = pcm1.calc_crc(words, xp=np)
    bits = pcm1.words_to_data_bits(words, crcs, xp=np)
    px, (ds, de) = enc.render_bits(np.asarray(bits), width=W1, ppb=PPB1,
                                   noise_sigma=sigma, rng=rng)
    return (px.reshape(F, L, W1), np.tile([[ds, de]], (F, 1)),
            words.reshape(F, L, 6))


def _pcm16x0_frames(F=2, L=64, sigma=0.0, seed=6):
    rng = np.random.default_rng(seed)
    sub = rng.integers(1, 1 << 16, (F * L * 3, 3))
    crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
    bits = pcm16x0.line_bits(sub.reshape(F * L, 3, 3),
                             crcs.reshape(F * L, 3), 1, xp=np)
    px, (ds, de) = enc.render_bits(np.asarray(bits), width=W16, ppb=PPB16,
                                   noise_sigma=sigma, rng=rng)
    return (px.reshape(F, L, W16), np.tile([[ds, de]], (F, 1)),
            sub.reshape(F, L, 3, 3))


def _agc(F):
    return (np.full(F, 110, np.int32), np.full(F, 20, np.int32),
            np.full(F, 200, np.int32))


@pytest.mark.skipif(not sn.available(), reason="native core unavailable")
@pytest.mark.parametrize("hl,sl", [(0, 1), (4, 2), (10, 0)])
@pytest.mark.parametrize("sigma", [0.0, 28.0])
def test_pcm1_grid_identity(hl, sl, sigma):
    import jax.numpy as jnp
    px, cd, _ = _pcm1_frames(sigma=sigma)
    ref, blk, wht = _agc(px.shape[0])
    xw, xc, xv = bz.pcm1_frame_decode(
        jnp.asarray(px), jnp.asarray(cd.astype(np.int32)),
        jnp.asarray(ref), jnp.asarray(blk), jnp.asarray(wht),
        shift_limit=sl, hyst_limit=hl)
    nw, nc, nv = sn.pcm1_binarize_frames(px, cd, ref, blk, wht, sl,
                                         hyst_limit=hl)
    assert np.array_equal(np.asarray(xv), nv)
    assert np.array_equal(np.asarray(xw), nw)
    assert np.array_equal(np.asarray(xc), nc)


@pytest.mark.skipif(not sn.available(), reason="native core unavailable")
@pytest.mark.parametrize("hl,sl", [(0, 1), (4, 2)])
@pytest.mark.parametrize("sigma", [0.0, 28.0])
def test_pcm16x0_grid_identity(hl, sl, sigma):
    import jax.numpy as jnp
    px, cd, _ = _pcm16x0_frames(sigma=sigma)
    ref, blk, wht = _agc(px.shape[0])
    xw, xc, xv, xb = bz.pcm16x0_frame_decode(
        jnp.asarray(px), jnp.asarray(cd.astype(np.int32)),
        jnp.asarray(ref), jnp.asarray(blk), jnp.asarray(wht),
        shift_limit=sl, hyst_limit=hl)
    nw, nc, nv, nb = sn.pcm16x0_binarize_frames(px, cd, ref, blk, wht,
                                                sl, hyst_limit=hl)
    assert np.array_equal(np.asarray(xv), nv)
    assert np.array_equal(np.asarray(xw), nw)
    assert np.array_equal(np.asarray(xc), nc)
    assert np.array_equal(np.asarray(xb), nb)


def _recovery(fmt, hl, sigma, seed):
    """valid count + false-positive check through PCMFrameDriver's
    decode path (refine off so the gain isolates the depth axis)."""
    if fmt == "pcm1":
        px, cd, words = _pcm1_frames(F=4, sigma=sigma, seed=seed)
    else:
        px, cd, words = _pcm16x0_frames(F=4, sigma=sigma, seed=seed)
    ref, blk, wht = _agc(px.shape[0])
    prep = dict(coords=cd, refs=ref.astype(np.int64),
                blacks=blk.astype(np.int64), whites=wht.astype(np.int64),
                usable=np.ones(px.shape[0], bool))
    from sdvpcmdecoder_tpu.pipeline import v2d_other
    drv = v2d_other.PCMFrameDriver(fmt, shift_limit=1, hyst_limit=hl,
                                   refine=False)
    res = drv.decode_prepared(px, prep)
    n_valid, n_false = 0, 0
    for f, r in enumerate(res):
        v = r.valid
        n_valid += int(v.sum())
        got = r.words.reshape(words.shape[1:])
        exp = words[f]
        vv = v.reshape(words.shape[1:-1] + (1,)) \
            if fmt == "pcm16x0" else v[:, None]
        n_false += int((np.broadcast_to(vv, exp.shape)
                        & (got != exp)).sum())
    return n_valid, n_false


@pytest.mark.parametrize("fmt,sigma", [("pcm1", 34.0), ("pcm16x0", 30.0)])
def test_hyst_depth_recovers_more(fmt, sigma):
    v0, f0 = _recovery(fmt, 0, sigma, seed=11)
    v4, f4 = _recovery(fmt, 4, sigma, seed=11)
    assert f0 == 0 and f4 == 0, "CRC-valid lines must decode bit-exact"
    assert v4 > v0, (f"{fmt}: depth 4 recovered {v4} vs {v0} at depth 0 "
                     f"(sigma={sigma}) — no gain from the hysteresis axis")


def test_driver_quality_wiring():
    """BatchDecoder hands hyst_limit + resolved backend to the PCM
    drivers (VERDICT r3 item 9)."""
    import os
    import tempfile
    from sdvpcmdecoder_tpu.pipeline import batch_driver
    with tempfile.TemporaryDirectory() as tmp:
        from sdvpcmdecoder_tpu.pipeline import ingest
        p = os.path.join(tmp, "c.y4m")
        ingest.write_y4m(p, np.zeros((1, 8, 64), np.uint8))
        dec = batch_driver.BatchDecoder(
            [(p, os.path.join(tmp, "c.wav"))], fmt="pcm1",
            hyst_limit=3, shift_limit=1, backend="tpu")
        assert dec.jobs[0].driver.hyst_limit == 3
        assert dec.jobs[0].driver.backend == "tpu"
        dec2 = batch_driver.BatchDecoder(
            [(p, os.path.join(tmp, "d.wav"))], fmt="pcm16x0",
            hyst_limit=2, backend="native")
        want = "native" if sn.available() else "tpu"
        assert dec2.jobs[0].driver.backend == want
        assert dec2.jobs[0].driver.hyst_limit == 2
