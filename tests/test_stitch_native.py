"""Native stitch core == numpy correct_blocks, bit for bit.

Randomized sweep over error patterns x resolutions x flag combos, plus
directed cases for every branch of the decision tree (forced-P BROKEN,
Q-patch, pair solves, 3-erasure guard).
"""
import importlib

import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc


pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def numpy_correct(words, crc_ok, resolution, **kw):
    """Force the pure-numpy reference path."""
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    saved = mod._LIB, mod._TRIED
    mod._LIB, mod._TRIED = None, True
    try:
        return di.correct_blocks(words, crc_ok, resolution, xp=np, **kw)
    finally:
        mod._LIB, mod._TRIED = saved


def _good_blocks(rng, B):
    """Blocks with consistent P/Q codes (valid code words)."""
    left = rng.integers(0, 1 << 14, size=3 * B)
    right = rng.integers(0, 1 << 14, size=3 * B)
    return enc.samples_to_blocks(left, right)


@pytest.mark.parametrize("resolution", [di.RES_14BIT, di.RES_16BIT])
@pytest.mark.parametrize("en_p,en_q,force_ecc", [
    (True, True, True), (True, True, False), (True, False, True),
    (False, False, True), (False, True, True),
])
def test_native_matches_numpy_random(resolution, en_p, en_q, force_ecc):
    rng = np.random.default_rng(hash((resolution, en_p, en_q,
                                      force_ecc)) % (1 << 31))
    B = 512
    mask = 0x3FFF if resolution == di.RES_14BIT else 0xFFFF
    # Half valid code words (possibly corrupted), half pure noise.
    good = _good_blocks(rng, B // 2) & mask
    noise = rng.integers(0, mask + 1, size=(B - B // 2, 8))
    words = np.concatenate([good, noise]).astype(np.int64)
    # Corrupt random words of the good half, with matching CRC marks
    # sometimes wrong (false-positive CRC) to hit the forced-check paths.
    crc_ok = np.ones((B, 8), bool)
    n_bad = rng.integers(0, 5, size=B)
    for b in range(B):
        idx = rng.choice(8, size=n_bad[b], replace=False)
        crc_ok[b, idx] = False
        flip = rng.random(len(idx)) < 0.7
        words[b, idx[flip]] ^= rng.integers(1, mask + 1, size=flip.sum())
    # Some blocks: corrupt but leave CRC marked ok (false positives).
    fp = rng.random(B) < 0.2
    words[fp, 0] ^= 0x5
    kw = dict(en_p=en_p, en_q=en_q, force_ecc=force_ecc)
    ref = numpy_correct(words, crc_ok, resolution, **kw)
    nat = di.correct_blocks(words, crc_ok, resolution, xp=np, **kw)
    np.testing.assert_array_equal(np.asarray(ref.words), nat.words)
    np.testing.assert_array_equal(np.asarray(ref.valid), nat.valid)
    np.testing.assert_array_equal(np.asarray(ref.line_crc), nat.line_crc)
    np.testing.assert_array_equal(np.asarray(ref.audio_state),
                                  nat.audio_state)
    np.testing.assert_array_equal(np.asarray(ref.stage), nat.stage)


def test_native_corrects_erasures():
    """Sanity: the native path actually repairs <=2 erasures."""
    rng = np.random.default_rng(3)
    blocks = _good_blocks(rng, 64)
    words = blocks.copy()
    crc_ok = np.ones((64, 8), bool)
    # one erasure in audio word 2
    words[:32, 2] ^= 0x155
    crc_ok[:32, 2] = False
    # two erasures in words 1 and 4
    words[32:, 1] ^= 0x20A
    words[32:, 4] ^= 0x3001
    crc_ok[32:, 1] = False
    crc_ok[32:, 4] = False
    out = di.correct_blocks(words, crc_ok, di.RES_14BIT, xp=np)
    np.testing.assert_array_equal(out.words[:, :6], blocks[:, :6])
    assert (out.audio_state[:32] == di.AUD_FIX_P).all()
    assert (out.audio_state[32:] == di.AUD_FIX_Q).all()


def test_peak_scan_native_matches_python():
    from sdvpcmdecoder_tpu.ops import agc
    rng = np.random.default_rng(0)
    for _ in range(20):
        N = int(rng.integers(1, 40))
        hist = rng.integers(0, 50, size=(N, 256)).astype(np.int64)
        start = rng.integers(0, 256, size=N)
        stop = rng.integers(0, 256, size=N)
        minc = rng.integers(0, 10, size=N)
        delta = rng.integers(0, 40, size=N)
        for up in (True, False):
            b1, f1 = sn.peak_scan(hist, start, stop, minc, delta, up)
            import sdvpcmdecoder_tpu.ops.stitch_native as mod
            saved = mod._LIB, mod._TRIED
            mod._LIB, mod._TRIED = None, True
            try:
                b2, f2 = agc._peak_scan(hist, start.copy(), stop, minc,
                                        delta, up)
            finally:
                mod._LIB, mod._TRIED = saved
            np.testing.assert_array_equal(b1, b2)
            np.testing.assert_array_equal(f1, f2)


def test_pcm16x0_decode_native_matches_numpy():
    from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
    rng = np.random.default_rng(0)
    for ei in (False, True):
        for en_p, force in ((True, True), (True, False), (False, True)):
            if ei:
                n_lines, npairs = 2 * 245, di16.EI_OFS * 3
            else:
                n_lines, npairs = 245, 735
            l = rng.integers(1, 1 << 16, npairs)
            r = rng.integers(1, 1 << 16, npairs)
            sub, _ = di16.interleave_field(l, r, n_lines, ei=ei)
            sub = sub.copy()
            corrupt = rng.random(len(sub)) < 0.1
            sub[corrupt, rng.integers(0, 3)] ^= 0x33
            ok = rng.random(len(sub)) > 0.2
            S = len(sub)
            n = S - 2 * (di16.EI_OFS if ei else di16.SI_OFS) - 1
            shifts = np.arange(max(n, 10))
            orders = (shifts % 2) == 1
            a = di16.decode_blocks(sub, ok, shifts, orders, ei=ei,
                                   en_p=en_p, force_ecc=force)
            import sdvpcmdecoder_tpu.ops.stitch_native as mod
            saved = mod._LIB, mod._TRIED
            mod._LIB, mod._TRIED = None, True
            try:
                b = di16.decode_blocks(sub, ok, shifts, orders, ei=ei,
                                       en_p=en_p, force_ecc=force)
            finally:
                mod._LIB, mod._TRIED = saved
            for k in a:
                if k not in b:  # native-only extras (flags/counters)
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]),
                    err_msg=f"{k} ei={ei} en_p={en_p} force={force}")


def test_crc_row_matches_calc_crc():
    rng = np.random.default_rng(4)
    w = rng.integers(0, 1 << 14, size=(200, 8)).astype(np.int64)
    ref = np.asarray(stc007.calc_crc(w, xp=np))
    got = np.array([sn.crc_row(w[i]) for i in range(200)])
    np.testing.assert_array_equal(ref, got)


def test_crc_rows_matches_formats():
    if not sn.available():
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(5)
    w = rng.integers(0, 1 << 14, size=(301, 8))
    np.testing.assert_array_equal(
        sn.crc_rows(w), np.asarray(stc007.calc_crc(w, xp=np)))
    assert sn.crc_rows(np.zeros((0, 8), np.int64)).shape == (0,)


def test_empty_lines_single_crc_broadcast():
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    for m2 in (False, True):
        ls = st.LineStore.empty_lines(7, m2=m2)
        calc = np.asarray(stc007.calc_crc(ls.words, xp=np))
        np.testing.assert_array_equal(ls.source_crc, (~calc) & 0xFFFF)
        assert not ls.crc_valid_ignore_forced().any()
    assert st.LineStore.empty_lines(0).source_crc.shape == (0,)
