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
