"""Native PCM-16x0 burst walk + block flags == numpy twins."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def test_burst_differential():
    rng = np.random.default_rng(5)
    for trial in range(300):
        B = int(rng.integers(0, 300))
        silent = rng.random(B) < 0.2
        bv = rng.random(B) < 0.6
        fixp = rng.random(B) < 0.2
        broken = rng.random(B) < 0.1
        nochk = rng.random(B) < 0.15
        flags = (silent.astype(np.uint8) | (bv.astype(np.uint8) << 1)
                 | (fixp.astype(np.uint8) << 2)
                 | (broken.astype(np.uint8) << 3)
                 | (nochk.astype(np.uint8) << 4))
        valid_b = bv & ~silent & ~nochk
        unch = nochk | fixp
        for max_sil, max_unch, as_run, fn in (
                (sp.MAX_BURST_SILENCE_SI, sp.MAX_BURST_UNCH_SI, False,
                 sp._burst_stats16),
                (sp.MAX_BURST_SILENCE_EI, sp.MAX_BURST_UNCH_EI, True,
                 sp._burst_stats_ei)):
            nat = sn.pcm16x0_burst(flags, max_sil, max_unch, as_run)
            ref = fn(valid_b, silent, unch, broken)
            assert tuple(nat) == tuple(ref), (trial, nat, ref)


def test_flags_counters_differential():
    rng = np.random.default_rng(6)
    for trial in range(30):
        S = int(rng.integers(220, 1200))
        words = rng.integers(0, 1 << 16, (S, 3)).astype(np.int64)
        crc = rng.random(S) < 0.7
        n = S - 2 * di16.SI_OFS - 1
        shifts = np.arange(max(n, 1)) % max(S - 2 * di16.SI_OFS, 1)
        orders = (shifts % 2) == 1
        res = di16.decode_blocks(words, crc, shifts, orders, ei=False)
        vb, sil, un, br = sp._si_seam_flags(res)
        f = res["flags"]
        np.testing.assert_array_equal(sil, (f & 1) != 0)
        np.testing.assert_array_equal(vb, ((f & 2) != 0) & ~sil
                                      & ~((f & 16) != 0))
        np.testing.assert_array_equal(br, (f & 8) != 0)
        drop = int(np.sum(~res["word_valid"][..., :2].all(axis=-1)))
        brk = int(np.sum(res["state"] == di16.AUD_BROKEN))
        fixp = int(np.sum(res["state"] == di16.AUD_FIX_P))
        sdrop = int(np.sum(~res["word_valid"][..., :2]))
        assert list(res["counters"]) == [drop, brk, fixp, sdrop], trial
