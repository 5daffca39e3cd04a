"""--cwd on the steady fast path (VERDICT r3 item 7).

en_cwd is admitted to the steady pair path under the STEADY.md defer
contract: the pair rides stc007_steady_tail when the CWD pre-scan is a
provable no-op (no valid P/Q-fixed candidate blocks over the extended
conv queue), and defers to the full machine — which performs the real
write-back fixpoint (performCWD stc007datastitcher.cpp:5905) — the
moment any candidate exists or the carry holds CWD-fixed lines.
Differential: fast == machine on every output surface, with the fast
path demonstrably engaging on clean stretches.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from tests.test_steady_pair import _assert_same, _capture, _run

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def test_cwd_clean_capture_engages_and_matches():
    """Clean tape: CWD is a no-op everywhere, so every steady pair must
    ride the fast path AND match the machine bit-for-bit."""
    frames = _capture()
    hits = _assert_same(frames, corrupt=0, want_hits=5,
                        preset_video=st.VID_PAL, en_cwd=True)
    assert hits >= 5


def test_cwd_corrupted_matches():
    """CRC knockouts make P/Q fix blocks -> CWD candidates -> those
    pairs defer and the machine's write-back runs; outputs stay
    identical to the machine-only run."""
    frames = _capture(seed=12)
    _assert_same(frames, corrupt=40, seed=7, en_cwd=True)


def test_cwd_heavy_corruption_defers_not_diverges():
    frames = _capture(n_frames=6, seed=13)
    _assert_same(frames, corrupt=220, seed=9, en_cwd=True)


def test_cwd_16bit_matches():
    frames = _capture(resolution=16, seed=14)
    _assert_same(frames, corrupt=20, seed=5, en_cwd=True)


def test_cwd_recovers_fast_path_after_burst():
    """A corrupted stretch defers (real CWD fixes), then clean frames
    re-engage the fast path once the carry sheds its fixed flags."""
    frames = _capture(n_frames=10, seed=15)
    rng = np.random.default_rng(21)
    s, arrs, hits = _run(frames, corrupt=0, disable_fast=False,
                         en_cwd=True)
    assert hits >= 7  # all-clean baseline: nearly every pair fast

    # corrupt only frames 3-4 (the _run harness corrupts every frame,
    # so drive the stitcher directly here)
    s2 = st.STC007Stitcher(en_cwd=True)
    hits2 = [0]
    orig = st.STC007Stitcher._try_steady_pair

    def spy():
        r = orig(s2)
        if r:
            hits2[0] += 1
        return r
    s2._try_steady_pair = spy
    s3 = st.STC007Stitcher(en_cwd=True)
    s3._try_steady_pair = lambda: False
    chunks2, chunks3 = [], []
    for k, fr in enumerate(frames):
        v = np.ones(len(fr["crcs"]), bool)
        if k in (3, 4):
            v[rng.integers(0, len(v), 60)] = False
        store_args = (fr["line_words"], fr["crcs"], v,
                      np.full(len(fr["crcs"]), fr["frame_number"]),
                      fr["line_numbers"])
        s2.push_frame(st.LineStore.from_decoded(*store_args))
        chunks2.extend(s2.pop_sample_chunks())
        s3.push_frame(st.LineStore.from_decoded(*store_args))
        chunks3.extend(s3.pop_sample_chunks())
    s2.finish()
    s3.finish()
    chunks2.extend(s2.pop_sample_chunks())
    chunks3.extend(s3.pop_sample_chunks())
    a2 = st.chunks_to_arrays(chunks2)
    a3 = st.chunks_to_arrays(chunks3)
    for x, y in zip(a2[:3], a3[:3]):
        np.testing.assert_array_equal(x, y)
    import dataclasses
    for ff, fm in zip(s2.frame_log, s3.frame_log):
        assert dataclasses.asdict(ff) == dataclasses.asdict(fm)
    assert hits2[0] >= 4, \
        f"fast path re-engaged only {hits2[0]}x around the burst"


def _run_batched(frames, n_bad, seed, en_cwd, disable_fast=False,
                 corrupt_words=True):
    """Whole-round pushes (the batch driver's shape) with REAL dropouts:
    one word of each hit line garbled so CWD has something to fix."""
    rng = np.random.default_rng(seed)
    s = st.STC007Stitcher(en_cwd=en_cwd, preset_video=st.VID_PAL)
    if disable_fast:
        s._try_steady_run = lambda: False
        s._try_steady_pair = lambda: False
    stores = []
    for fr in frames:
        words = np.array(fr["line_words"])
        v = np.ones(len(fr["crcs"]), bool)
        if n_bad:
            bad = rng.integers(0, len(v), n_bad)
            if corrupt_words:
                for r in bad:
                    w = rng.integers(0, 6)
                    words[r, w] ^= int(rng.integers(1, 1 << 14))
            v[bad] = False
        stores.append(st.LineStore.from_decoded(
            words, fr["crcs"], v,
            np.full(len(fr["crcs"]), fr["frame_number"]),
            fr["line_numbers"]))
    out = []
    for i in range(0, len(stores), 4):
        s.push_frames(stores[i:i + 4])
        out.extend(s.pop_sample_chunks())
    s.finish()
    out.extend(s.pop_sample_chunks())
    return s, st.chunks_to_arrays(out)


def _round_pair_spy():
    import contextlib

    @contextlib.contextmanager
    def cm(counter):
        orig = sn.steady_round

        def spy(*a, **k):
            out = orig(*a, **k)
            counter[0] += out[0]
            return out

        sn.steady_round = spy
        try:
            yield
        finally:
            sn.steady_round = orig
    return cm


def test_cwd_steady_round_fixes_and_matches_machine():
    """VERDICT r4 item 5: the C steady round runs the performCWD
    write-back fixpoint — on a word-corrupted capture the round path
    keeps consuming pairs, CWD-assisted blocks get counted, MORE
    samples come back valid than without --cwd, and every output
    surface equals the machine-only run bit for bit."""
    import dataclasses
    frames = _capture(n_frames=12, seed=12)
    cm = _round_pair_spy()
    pairs_clean, pairs_bad = [0], [0]
    with cm(pairs_clean):
        _run_batched(frames, 0, 7, True)
    with cm(pairs_bad):
        s_f, a_f = _run_batched(frames, 25, 7, True)
    s_r, a_r = _run_batched(frames, 25, 7, True, disable_fast=True)
    for x, y in zip(a_f[:3], a_r[:3]):
        np.testing.assert_array_equal(x, y)
    assert len(s_f.frame_log) == len(s_r.frame_log)
    for ff, fr_ in zip(s_f.frame_log, s_r.frame_log):
        assert dataclasses.asdict(ff) == dataclasses.asdict(fr_)
    assert s_f.broken_countdown == s_r.broken_countdown
    assert sum(f.blocks_fix_cwd for f in s_f.frame_log) > 0
    # steady hit-rate within ~2x of clean (the VERDICT done criterion)
    assert pairs_bad[0] * 2 >= pairs_clean[0], (pairs_bad, pairs_clean)
    # CWD actually recovers samples vs a no-CWD run
    _, a_n = _run_batched(frames, 25, 7, False)
    assert int(a_f[1].sum()) > int(a_n[1].sum())


def test_cwd_steady_round_heavy_corruption_matches():
    frames = _capture(n_frames=8, seed=13)
    s_f, a_f = _run_batched(frames, 60, 9, True)
    s_r, a_r = _run_batched(frames, 60, 9, True, disable_fast=True)
    for x, y in zip(a_f[:3], a_r[:3]):
        np.testing.assert_array_equal(x, y)
    assert a_f[3] == a_r[3]


def test_cwd_steady_round_16bit_matches():
    frames = _capture(n_frames=8, resolution=16, seed=14)
    s_f, a_f = _run_batched(frames, 30, 5, True)
    s_r, a_r = _run_batched(frames, 30, 5, True, disable_fast=True)
    for x, y in zip(a_f[:3], a_r[:3]):
        np.testing.assert_array_equal(x, y)
