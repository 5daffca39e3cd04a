"""Vectorized stitcher hot paths == the serial reference semantics.

Covers _burst_stats (tryPadding counters :1623-1720), the batched padding
sweep (findPadding :1743-2057), and the greedy BROKEN-mask countdown
(performDeinterleave :6798-6830).
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc


def serial_burst_stats(valid_b, silent, unch, broken, unchecked_lim):
    """Straight transcription of the reference's tryPadding counters."""
    valid_run = sil_run = unch_run = 0
    valid_max = sil_max = unch_max = 0
    broken_count = 0
    for i in range(len(valid_b)):
        if valid_b[i]:
            valid_run += 1
        else:
            valid_max = max(valid_max, valid_run)
        if silent[i]:
            sil_run += 1
            if sil_run >= st.MAX_BURST_SILENCE:
                valid_run = 0
        else:
            sil_max = max(sil_max, sil_run)
            sil_run = 0
        if unch[i]:
            unch_run += 1
            if unch_run >= unchecked_lim:
                valid_run = 0
        else:
            unch_max = max(unch_max, unch_run)
            unch_run = 0
        if broken[i]:
            broken_count += 1
            if broken_count >= st.MAX_BURST_BROKEN:
                valid_run = 0
    valid_max = max(valid_max, valid_run)
    sil_max = max(sil_max, sil_run)
    unch_max = max(unch_max, unch_run)
    return valid_max, sil_max, unch_max, broken_count


@pytest.mark.parametrize("seed", range(8))
def test_burst_stats_matches_serial(seed):
    rng = np.random.default_rng(seed)
    for n in (1, 7, 64, 240):
        for p in (0.05, 0.3, 0.8):
            valid_b = rng.random(n) < (1 - p)
            silent = rng.random(n) < p
            unch = rng.random(n) < p / 2
            broken = rng.random(n) < p / 8
            for lim in (1, 8, 0x40):
                assert st._burst_stats(valid_b, silent, unch, broken,
                                       lim) == \
                    serial_burst_stats(valid_b, silent, unch, broken, lim)


def test_burst_stats_empty():
    z = np.zeros(0, bool)
    assert st._burst_stats(z, z, z, z, 8) == (0, 0, 0, 0)


def _make_field(rng, n_lines, frame_no, first_line, bad_frac=0.0,
                parity_odd=True):
    n = 3 * n_lines
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    words, crcs = enc.words_for_stream(left, right, n_lines) \
        if hasattr(enc, "words_for_stream") else (None, None)
    if words is None:
        # build via line packing: random words, valid CRC
        words = rng.integers(0, 1 << 14, size=(n_lines, 8)).astype(np.int64)
        crcs = stc007.calc_crc(words, xp=np)
    store = st.LineStore(n_lines)
    store.words = np.asarray(words, np.int64)
    store.source_crc = np.asarray(crcs, np.int64)
    v = np.ones(n_lines, bool)
    if bad_frac:
        v &= rng.random(n_lines) > bad_frac
    store.word_crc[:] = v[:, None]
    store.word_valid[:] = v[:, None]
    store.frame_number[:] = frame_no
    start = first_line if parity_odd else first_line + 1
    store.line_number = start + 2 * np.arange(n_lines)
    store.coords_valid[:] = True
    store.bw_set[:] = True
    store.has_markers[:] = v
    return store


def serial_find_padding_stats(stitcher, field1, field2, max_padding):
    return [stitcher.try_padding(field1, field2, p)[1]
            for p in range(max_padding)]


@pytest.mark.parametrize("seed,bad", [(0, 0.0), (1, 0.15), (2, 0.5),
                                      (3, 0.9)])
def test_batched_padding_stats_matches_serial(seed, bad):
    rng = np.random.default_rng(seed)
    stitcher = st.STC007Stitcher()
    stitcher.frasm_f1.frame_number = 1
    stitcher.frasm_f2.frame_number = 2
    f1 = _make_field(rng, 200, 1, 1, bad_frac=bad, parity_odd=True)
    f2 = _make_field(rng, 200, 1, 2, bad_frac=bad, parity_odd=False)
    for max_pad in (st.MAX_PADDING_16BIT, st.MAX_PADDING_14BIT):
        batched = stitcher.batched_padding_stats(f1, f2, max_pad)
        serial = serial_find_padding_stats(stitcher, f1, f2, max_pad)
        assert batched == serial


def test_batched_padding_stats_short_fields():
    rng = np.random.default_rng(7)
    stitcher = st.STC007Stitcher()
    stitcher.frasm_f1.frame_number = 1
    stitcher.frasm_f2.frame_number = 2
    # field1 shorter than keep (120): queue lengths vary per padding.
    f1 = _make_field(rng, 60, 1, 1)
    f2 = _make_field(rng, 80, 1, 2, parity_odd=False)
    batched = stitcher.batched_padding_stats(f1, f2, st.MAX_PADDING_14BIT)
    serial = serial_find_padding_stats(stitcher, f1, f2,
                                       st.MAX_PADDING_14BIT)
    assert batched == serial
    # Degenerate: too short for any block -> all None either way.
    f1s = _make_field(rng, 10, 1, 1)
    f2s = _make_field(rng, 10, 1, 2, parity_odd=False)
    batched = stitcher.batched_padding_stats(f1s, f2s, 8)
    serial = serial_find_padding_stats(stitcher, f1s, f2s, 8)
    assert batched == serial == [None] * 8


def serial_broken_mask(broken, silent, unsafe, countdown, dur):
    n = len(broken)
    post = np.zeros(n, bool)
    for b in range(n):
        if not silent[b] and not unsafe[b]:
            if dur > 0 and countdown == 0 and broken[b]:
                countdown = dur
            if countdown != 0:
                post[b] = True
        if countdown > 0:
            countdown -= 1
    return post, countdown


def greedy_broken_mask(broken, silent, unsafe, countdown, dur):
    """Re-run the stitcher's greedy window logic standalone."""
    n_blocks = len(broken)
    post_broken = np.zeros(n_blocks, bool)
    active = ~silent & ~unsafe
    if countdown > 0 or (dur > 0 and bool((active & broken).any())):
        triggers = np.nonzero(active & broken)[0]
        t_i = 0
        pos = 0
        while pos < n_blocks:
            if countdown > 0:
                end = min(n_blocks, pos + countdown)
                post_broken[pos:end] = active[pos:end]
                countdown -= end - pos
                pos = end
            else:
                while t_i < len(triggers) and triggers[t_i] < pos:
                    t_i += 1
                if t_i >= len(triggers) or dur <= 0:
                    break
                pos = int(triggers[t_i])
                countdown = dur
    return post_broken, countdown


@pytest.mark.parametrize("seed", range(6))
def test_broken_mask_matches_serial(seed):
    rng = np.random.default_rng(seed)
    for n in (1, 50, 300):
        for dur in (0, 3, 64):
            for cd0 in (0, 2, 100):
                broken = rng.random(n) < 0.05
                silent = rng.random(n) < 0.2
                unsafe = rng.random(n) < 0.1
                sp, sc = serial_broken_mask(broken, silent, unsafe, cd0,
                                            dur)
                gp, gc = greedy_broken_mask(broken, silent, unsafe, cd0,
                                            dur)
                np.testing.assert_array_equal(sp, gp)
                assert sc == gc


def test_burst_stats_ei_matches_serial():
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16

    def serial(valid_b, silent, unch, broken):
        vmax = smax = umax = bmax = 0
        vrun = srun = urun = brun = 0
        for k in range(len(valid_b)):
            if valid_b[k]:
                vrun += 1
            else:
                vmax = max(vmax, vrun)
            if silent[k]:
                srun += 1
                if srun >= sp16.MAX_BURST_SILENCE_EI:
                    vrun = 0
            else:
                smax = max(smax, srun)
                srun = 0
            if unch[k]:
                urun += 1
                if urun > sp16.MAX_BURST_UNCH_EI:
                    vrun = 0
            else:
                umax = max(umax, urun)
                urun = 0
            if broken[k]:
                brun += 1
                vrun = 0
            else:
                bmax = max(bmax, brun)
                brun = 0
        return (max(vmax, vrun), max(smax, srun), max(umax, urun),
                max(bmax, brun))

    rng = np.random.default_rng(1)
    for n in (1, 40, 500):
        for p in (0.05, 0.4, 0.9):
            v = rng.random(n) < (1 - p)
            s = rng.random(n) < p
            u = rng.random(n) < p / 2
            b = rng.random(n) < p / 6
            assert sp16._burst_stats_ei(v, s, u, b) == serial(v, s, u, b)


def test_burst_stats16_matches_serial():
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16

    def serial(valid_b, silent, unch, broken):
        vmax = smax = umax = 0
        vrun = srun = urun = 0
        brk_total = 0
        for k in range(len(valid_b)):
            if valid_b[k]:
                vrun += 1
            else:
                vmax = max(vmax, vrun)
            if silent[k]:
                srun += 1
                if srun >= sp16.MAX_BURST_SILENCE_SI:
                    vrun = 0
            else:
                smax = max(smax, srun)
                srun = 0
            if unch[k]:
                urun += 1
                if urun > sp16.MAX_BURST_UNCH_SI:
                    vrun = 0
            else:
                umax = max(umax, urun)
                urun = 0
            if broken[k]:
                brk_total += 1
                vrun = 0
        return (max(vmax, vrun), max(smax, srun), max(umax, urun),
                brk_total)

    rng = np.random.default_rng(2)
    for n in (1, 40, 500):
        for p in (0.05, 0.4, 0.9):
            v = rng.random(n) < (1 - p)
            s = rng.random(n) < p
            u = rng.random(n) < p / 2
            b = rng.random(n) < p / 6
            assert sp16._burst_stats16(v, s, u, b) == serial(v, s, u, b)
