"""Native single-call seam eval (stc007_eval_seam) == slim-queue path."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")

MODES = (di.RES_MODE_14BIT, di.RES_MODE_14BIT_AUTO,
         di.RES_MODE_16BIT, di.RES_MODE_16BIT_AUTO)


def _field(rng, n, fno, start_line, bad_frac, res=14):
    left = rng.integers(0, 1 << (14 if res == 14 else 16), size=3 * n)
    right = rng.integers(0, 1 << (14 if res == 14 else 16), size=3 * n)
    to_blocks = enc.samples_to_blocks if res == 14 \
        else enc.samples_to_blocks16
    blocks = to_blocks(left, right)
    words, crcs = enc.blocks_to_lines(blocks, n, resolution=res)
    s = st.LineStore(n)
    s.words = np.asarray(words, np.int64)
    s.source_crc = np.asarray(crcs, np.int64)
    v = rng.random(n) > bad_frac
    s.word_crc[:] = v[:, None]
    s.forced_bad[:] = rng.random(n) < 0.05
    s.frame_number[:] = fno
    s.line_number[:] = start_line + 2 * np.arange(n)
    return s


def _queue_path(sti, f1, f2, pad):
    q = sti._slim_padding_queue(f1, f2, pad)
    if len(q) < stc007.MIN_DEINT_DATA:
        return (st.DS_RET_NO_DATA, None)
    res_mode = sti.get_data_block_resolution(q, 0)
    batch, _, aux = st.eval_blocks(
        q, res_mode, ignore_crc=False, force_ecc=True, en_p=sti.en_p,
        en_q=sti.en_q, en_cwd=False, m2=sti.mode_m2, full_aux=False)
    if batch is None:
        return (st.DS_RET_NO_DATA, None)
    ul = sti.max_unch_14 if sti.en_q else sti.max_unch_16
    vmax, smax, umax, bcnt = sti._burst_from_aux(aux, ul)
    s_ = st.StitchStats(index=pad, valid=vmax, silent=smax,
                        unchecked=umax, broken=bcnt)
    return (sti._stats_verdict(s_, ul), s_)


def test_seam_eval_differential():
    rng = np.random.default_rng(3)
    sti = st.STC007Stitcher()
    for trial in range(120):
        n1 = int(rng.integers(0, 160))
        n2 = int(rng.integers(0, 160))
        res = 14 if rng.random() < 0.7 else 16
        f1 = _field(rng, n1, int(rng.integers(0, 3)), 1,
                    rng.random() * 0.5, res)
        f2 = _field(rng, n2, int(rng.integers(0, 3)),
                    0 if rng.random() < 0.5 else 2, rng.random() * 0.5,
                    res)
        pad = int(rng.integers(0, 33))
        sti.mode_m2 = bool(rng.random() < 0.2)
        sti.en_p = bool(rng.random() < 0.9)
        sti.en_q = bool(rng.random() < 0.9)
        sti.frasm_f1.frame_number = int(rng.integers(0, 3))
        sti.frasm_f2.frame_number = int(rng.integers(0, 3))
        for fr in (sti.frasm_f0, sti.frasm_f1, sti.frasm_f2):
            fr.odd_resolution = MODES[rng.integers(0, 4)]
            fr.even_resolution = MODES[rng.integers(0, 4)]
        nat = sti._try_padding_native(f1, f2, pad)
        ref = _queue_path(sti, f1, f2, pad)
        assert nat == ref, (trial, pad, n1, n2, nat, ref)


def test_native_padding_sweep_matches_grouped_and_serial():
    """stc007_padding_sweep == the grouped index-map sweep == serial
    try_padding, across noise levels and field sizes."""
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as stm
    rng = np.random.default_rng(17)
    for trial, (n1, n2, bad) in enumerate(
            ((294, 294, 0.05), (240, 280, 0.3), (130, 294, 0.0),
             (294, 100, 0.6))):
        s = stm.STC007Stitcher()
        s.frasm_f1.frame_number = 1
        s.frasm_f2.frame_number = 2
        f1 = _field(rng, n1, 1, 1, bad)
        f2 = _field(rng, n2, 2, 1, bad)
        native = s.batched_padding_stats(f1, f2, 32)
        # serial reference: per-pad try_padding
        for p, st_n in enumerate(native):
            _, st_s = s.try_padding(f1, f2, p)
            if st_n is None or st_s is None:
                assert st_n is None and st_s is None, (trial, p)
                continue
            assert (st_n.valid, st_n.silent, st_n.unchecked,
                    st_n.broken) == (st_s.valid, st_s.silent,
                                     st_s.unchecked, st_s.broken), \
                (trial, p)
        # grouped index-map reference (the no-native construction, which
        # itself falls back to the numpy eval)
        saved = mod._LIB, mod._TRIED
        mod._LIB, mod._TRIED = None, True
        try:
            s2 = stm.STC007Stitcher()
            s2.frasm_f1.frame_number = 1
            s2.frasm_f2.frame_number = 2
            f1b = f1.take(np.arange(len(f1)))  # fresh caches
            f2b = f2.take(np.arange(len(f2)))
            grouped = s2.batched_padding_stats(f1b, f2b, 32)
        finally:
            mod._LIB, mod._TRIED = saved
        assert len(native) == len(grouped)
        for p, (a, b) in enumerate(zip(native, grouped)):
            if a is None or b is None:
                assert a is None and b is None, (trial, p)
                continue
            assert (a.valid, a.silent, a.unchecked, a.broken) == \
                (b.valid, b.silent, b.unchecked, b.broken), (trial, p)
