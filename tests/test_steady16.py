"""PCM-16x0 steady-frame fast path (pcm16x0_steady_frame) == push_frame.

The fast path runs trim/split/prescan/pad-0-check/ctrl-tally/stream in
one native call; chunks, frame logs and every stats history must be
identical to the unchanged frame logic, and anything non-steady must
defer, not diverge.
"""
import dataclasses

import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm16x0
from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")

LPF = sp16.LINES_PF
USABLE = (LPF * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE


def _samples(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 16, n), rng.integers(1, 1 << 16, n))


def _frame_store(frame_no, seed, bad_frac=0.0, picked=False):
    rng = np.random.default_rng(seed)
    parts = []
    for parity_base, s in ((1, seed * 2), (2, seed * 2 + 1)):
        left, right = _samples(USABLE, s)
        sub, _ = di16.interleave_field(left, right, LPF)
        S = len(sub)
        crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
        if bad_frac:
            bad = rng.random(S) < bad_frac
            crcs = np.where(bad, crcs ^ 0xFFFF, crcs)
        lines = parity_base + 2 * (np.arange(S) // 3)
        pl = pr = None
        if picked:
            pl = (rng.random(S) < 0.1).astype(np.int8)
            pr = (rng.random(S) < 0.1).astype(np.int8)
        parts.append(sp16.PCM16X0LineStore.from_decoded(
            sub, crcs, np.full(S, frame_no), lines,
            np.arange(S) % 3, picked_left=pl, picked_right=pr))
    return sp16.PCM16X0LineStore.concat(parts)


def _run(n_frames, disable, seed=0, bad_frac=0.0, picked=False,
         knockout=None, first_tag=True, **kw):
    s = sp16.PCM16X0Stitcher(**kw)
    hits = [0]
    if disable:
        s._try_steady_frame = lambda buf: False
    else:
        orig = sp16.PCM16X0Stitcher._try_steady_frame

        def spy(buf, _s=s):
            r = orig(_s, buf)
            if r:
                hits[0] += 1
            return r
        s._try_steady_frame = spy
    for f in range(n_frames):
        frac = 0.6 if knockout == f else bad_frac
        store = _frame_store(f + 1, seed + f, bad_frac=frac,
                             picked=picked)
        if f == 0 and first_tag:
            tag = sp16.PCM16X0LineStore(1)
            tag.service[0] = sp16.SRV_NEW_FILE
            tag.frame_number[0] = 1
            store = sp16.PCM16X0LineStore.concat([tag, store])
        s.push_frame(store)
    arr = st.chunks_to_arrays(s.pop_sample_chunks())
    log = [dataclasses.asdict(f) for f in s.frame_log]
    stats = (s.stats_padding, s.stats_emph, s.stats_rate, s.stats_code,
             s.stats_mode, s.fmt)
    return arr, log, stats, hits[0]


def _assert_equal(a, b, tag):
    assert (a[0] is None) == (b[0] is None), tag
    if a[0] is not None:
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y, err_msg=tag)
        assert a[0][3] == b[0][3], tag
    assert len(a[1]) == len(b[1]), tag
    for i, (f1, f2) in enumerate(zip(a[1], b[1])):
        assert f1 == f2, (tag, i,
                          {k: (f1[k], f2[k]) for k in f1 if f1[k] != f2[k]})
    assert a[2] == b[2], tag


def test_clean_si_engages_and_matches():
    f = _run(6, False, seed=1)
    r = _run(6, True, seed=1)
    _assert_equal(f, r, "clean")
    assert f[3] >= 5  # every non-tag frame takes the fast path


def test_noisy_si_matches():
    f = _run(6, False, seed=3, bad_frac=0.03, picked=True)
    r = _run(6, True, seed=3, bad_frac=0.03, picked=True)
    _assert_equal(f, r, "noisy")


def test_heavy_corruption_defers_not_diverges():
    f = _run(5, False, seed=5, bad_frac=0.03, knockout=2)
    r = _run(5, True, seed=5, bad_frac=0.03, knockout=2)
    _assert_equal(f, r, "knockout")


def test_ei_mode_never_engages():
    f = _run(3, False, seed=7, fmt=sp16.FORMAT_EI)
    r = _run(3, True, seed=7, fmt=sp16.FORMAT_EI)
    _assert_equal(f, r, "ei")
    assert f[3] == 0


def test_bff_order_matches():
    f = _run(5, False, seed=9, field_order=sp16.ORDER_BFF)
    r = _run(5, True, seed=9, field_order=sp16.ORDER_BFF)
    _assert_equal(f, r, "bff")
    assert f[3] >= 4


def test_steady16_config_fuzz():
    """Deterministic mini-fuzz over random corruption/picked/knockout/
    order configurations — fast frame == frame logic."""
    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(3, 9))
        seed = int(rng.integers(0, 10000))
        bad = float(rng.choice([0.0, 0.01, 0.05, 0.12]))
        picked = bool(rng.random() < 0.5)
        ko = int(rng.integers(0, n)) if rng.random() < 0.4 else None
        order = int(rng.choice([1, 2]))
        kw = dict(seed=seed, bad_frac=bad, picked=picked, knockout=ko,
                  field_order=order)
        f = _run(n, False, **kw)
        r = _run(n, True, **kw)
        _assert_equal(f, r, f"fuzz t{trial}")


def test_invalid_ctrl_stream_uses_history_fallback():
    """Killing the ctrl-bit sample sublines (block base + 1 + BIT_*_OFS)
    makes the det invalid: the frame flags come from the 65-deep
    histories — fast == slow through the fallback branch."""
    def stores():
        out = []
        for f in range(5):
            store = _frame_store(f + 1, 60 + f)
            if f >= 2:
                # invalidate every tallied subline in both fields
                S = len(store)
                kill = np.zeros(S, bool)
                half = S // 2
                for base in range(0, half, 105):
                    for ofs in (0, 3, 6, 9):
                        for fofs in (0, half):
                            i = fofs + base + 1 + ofs
                            if i < S:
                                kill[i] = True
                store.source_crc[kill] ^= 0xFFFF
                store.invalidate_crc()
            out.append(store)
        return out

    def run(disable):
        s = sp16.PCM16X0Stitcher()
        if disable:
            s._try_steady_frame = lambda buf: False
        for store in stores():
            s.push_frame(store)
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, s.stats_emph, s.stats_rate

    a, b = run(False), run(True)
    for x, y in zip(a[0][:3], b[0][:3]):
        np.testing.assert_array_equal(x, y)
    assert a[1:] == b[1:]


def test_auto_fmt_ei_switch_through_fast_path():
    """auto_fmt with an all-zero control-bit stream detects EI and
    switches from the next frame (collectCtrlBitStats MODE vote); the
    switch must behave identically through the fast path."""
    def run(disable):
        s = sp16.PCM16X0Stitcher(auto_fmt=True)
        if disable:
            s._try_steady_frame = lambda buf: False
        for f in range(4):
            s.push_frame(_frame_store(f + 1, 70 + f))
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, s.fmt

    a, b = run(False), run(True)
    assert a[2] == b[2]  # both switched (or not) identically
    for x, y in zip(a[0][:3], b[0][:3]):
        np.testing.assert_array_equal(x, y)
    assert a[1] == b[1]


def test_exact_silence_threshold_defers():
    """A silent run of EXACTLY MAX_BURST_SILENCE_SI blocks: the pad-0
    try says ok (smax <= limit) but findSIPadding takes the SILENCE
    route (smax >= limit) — the fast path must defer, not accept
    (regression: the steady accept used the non-strict bound)."""
    rng = np.random.default_rng(88)

    def silent_run_store(fno):
        parts = []
        for parity_base, s in ((1, 200), (2, 201)):
            left, right = _samples(USABLE, s)
            if parity_base == 1:
                # zero the samples feeding shifts 0..33 of group 0:
                # sublines {s, s+35, s+70 : s in 0..33} carry them
                sub0, _ = di16.interleave_field(left, right, LPF)
                sub0 = np.asarray(sub0).copy()
                for sh in range(34):
                    for k in range(3):
                        sub0[sh + 35 * k] = 0
                sub = sub0
            else:
                sub, _ = di16.interleave_field(left, right, LPF)
            S = len(sub)
            crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
            lines = parity_base + 2 * (np.arange(S) // 3)
            parts.append(sp16.PCM16X0LineStore.from_decoded(
                sub, crcs, np.full(S, fno), lines, np.arange(S) % 3))
        return sp16.PCM16X0LineStore.concat(parts)

    def run(disable):
        s = sp16.PCM16X0Stitcher()
        if disable:
            s._try_steady_frame = lambda buf: False
        for f in range(4):
            s.push_frame(_frame_store(f + 1, 90 + f) if f != 2
                         else silent_run_store(f + 1))
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, list(s.stats_padding)

    a, b = run(False), run(True)
    for x, y in zip(a[0][:3], b[0][:3]):
        np.testing.assert_array_equal(x, y)
    assert a[1] == b[1] and a[2] == b[2]
    # the crafted frame must actually hit the silence route
    assert any(f["silence"] for f in a[1]), "silence route exercised"


def test_cropped_fields_sweep_in_fast_path():
    """Top-cropped fields (nonzero SI padding) now ride the fast path:
    the C side runs findSIPadding's sweep + stats sort and the replay
    records the accepted paddings — identical to the machine."""
    crop = 4

    def cropped_store(fno, seed):
        parts = []
        for parity_base, s in ((1, seed * 2), (2, seed * 2 + 1)):
            left, right = _samples(USABLE, s)
            sub, _ = di16.interleave_field(left, right, LPF)
            sub = np.asarray(sub)[3 * crop:]
            S = len(sub)
            crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
            lines = parity_base + 2 * crop + 2 * (np.arange(S) // 3)
            parts.append(sp16.PCM16X0LineStore.from_decoded(
                sub, crcs, np.full(S, fno), lines, np.arange(S) % 3))
        return sp16.PCM16X0LineStore.concat(parts)

    def run(disable):
        s = sp16.PCM16X0Stitcher()
        hits = [0]
        if disable:
            s._try_steady_frame = lambda buf: False
        else:
            orig = sp16.PCM16X0Stitcher._try_steady_frame

            def spy(buf, _s=s):
                r = orig(_s, buf)
                if r:
                    hits[0] += 1
                return r
            s._try_steady_frame = spy
        for f in range(5):
            s.push_frame(cropped_store(f + 1, 120 + f))
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        log = [dataclasses.asdict(f) for f in s.frame_log]
        return arr, log, list(s.stats_padding), hits[0]

    a = run(False)
    b = run(True)
    for x, y in zip(a[0][:3], b[0][:3]):
        np.testing.assert_array_equal(x, y)
    assert a[1] == b[1] and a[2] == b[2]
    assert a[3] >= 4, "cropped frames must engage the fast path"
    assert set(a[2]) == {crop}, a[2]
