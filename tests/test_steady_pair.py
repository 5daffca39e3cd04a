"""Steady-state fast path (stc007_steady_tail) == the full stage machine.

The fast path handles TRY_PREVIOUS -> PAD_OK frames in one native call;
it must be bit-identical to the slow path on every output surface
(sample chunks, frasm log, stats counters, carried BROKEN countdown) and
must DEFER (not diverge) on anything non-steady.
"""
import dataclasses

import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _run(frames, corrupt, disable_fast, seed=0, **kw):
    rng = np.random.default_rng(seed)
    s = st.STC007Stitcher(**kw)
    if disable_fast:
        s._try_steady_pair = lambda: False
    hits = [0]
    if not disable_fast:
        orig = st.STC007Stitcher._try_steady_pair

        def spy(_o=orig, _s=s):
            r = _o(_s)
            if r:
                hits[0] += 1
            return r
        s._try_steady_pair = spy
    out = []
    for k, fr in enumerate(frames):
        v = np.ones(len(fr["crcs"]), bool)
        if corrupt:
            bad = rng.integers(0, len(v), corrupt)
            v[bad] = False
        store = st.LineStore.from_decoded(
            fr["line_words"], fr["crcs"], v,
            np.full(len(fr["crcs"]), fr["frame_number"]),
            fr["line_numbers"])
        s.push_frame(store)
        out.extend(s.pop_sample_chunks())
    s.finish()
    out.extend(s.pop_sample_chunks())
    return s, st.chunks_to_arrays(out), hits[0]


def _assert_same(frames, corrupt, seed=0, want_hits=None, **kw):
    s_f, a_f, hits = _run(frames, corrupt, False, seed=seed, **kw)
    s_r, a_r, _ = _run(frames, corrupt, True, seed=seed, **kw)
    assert (a_f is None) == (a_r is None)
    if a_f is not None:
        for x, y in zip(a_f[:3], a_r[:3]):
            np.testing.assert_array_equal(x, y)
        assert a_f[3] == a_r[3]
    # frame log: every frasm field identical, frame by frame
    assert len(s_f.frame_log) == len(s_r.frame_log)
    for i, (ff, fr_) in enumerate(zip(s_f.frame_log, s_r.frame_log)):
        assert dataclasses.asdict(ff) == dataclasses.asdict(fr_), i
    assert s_f.broken_countdown == s_r.broken_countdown
    assert s_f.stats_field_order == s_r.stats_field_order
    assert s_f.stats_resolution == s_r.stats_resolution
    if want_hits is not None:
        assert hits >= want_hits, f"fast path engaged {hits}x"
    return hits


def _capture(n_frames=8, lpf=294, resolution=14, seed=1, bottom_crop=0):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    return enc.encode_fields(rng.integers(1, 1 << 14, n),
                             rng.integers(1, 1 << 14, n), n_frames,
                             lines_pf=lpf, resolution=resolution,
                             bottom_crop=bottom_crop)


def test_clean_pal_capture_engages_and_matches():
    frames = _capture()
    hits = _assert_same(frames, corrupt=0, want_hits=5,
                        preset_video=st.VID_PAL)
    assert hits >= 5


def test_noisy_capture_matches():
    # enough corruption to exercise BROKEN masking and fix counters
    frames = _capture(seed=2)
    _assert_same(frames, corrupt=40, seed=7, want_hits=1)


def test_heavy_corruption_defers_not_diverges():
    frames = _capture(n_frames=6, seed=3)
    _assert_same(frames, corrupt=220, seed=9)


def test_16bit_capture_matches():
    frames = _capture(resolution=16, seed=4)
    _assert_same(frames, corrupt=20, seed=5, want_hits=1)


def test_ntsc_lines_matches():
    frames = _capture(lpf=245, seed=6)
    _assert_same(frames, corrupt=10, seed=3, want_hits=1)


def test_mid_stream_disturbance_recovers():
    """A badly corrupted frame mid-capture forces the slow path, then
    the fast path re-engages — outputs stay identical throughout."""
    frames = _capture(n_frames=10, seed=8)

    def run(disable):
        rng = np.random.default_rng(11)
        s = st.STC007Stitcher()
        if disable:
            s._try_steady_pair = lambda: False
        out = []
        for k, fr in enumerate(frames):
            v = np.ones(len(fr["crcs"]), bool)
            if k == 5:  # knock out half the frame
                v[rng.integers(0, len(v), 300)] = False
            store = st.LineStore.from_decoded(
                fr["line_words"], fr["crcs"], v,
                np.full(len(fr["crcs"]), fr["frame_number"]),
                fr["line_numbers"])
            s.push_frame(store)
            out.extend(s.pop_sample_chunks())
        s.finish()
        out.extend(s.pop_sample_chunks())
        return s, st.chunks_to_arrays(out)

    s_f, a_f = run(False)
    s_r, a_r = run(True)
    for x, y in zip(a_f[:3], a_r[:3]):
        np.testing.assert_array_equal(x, y)
    for ff, fr_ in zip(s_f.frame_log, s_r.frame_log):
        assert dataclasses.asdict(ff) == dataclasses.asdict(fr_)


def test_cwd_admitted_when_noop():
    """en_cwd rides the fast path on clean pairs (the CWD pre-scan is a
    provable no-op there) and stays bit-identical; the full en_cwd
    differential lives in tests/test_steady_cwd.py."""
    frames = _capture(n_frames=4, seed=10)
    hits = _assert_same(frames, corrupt=0, want_hits=1, en_cwd=True)
    assert hits >= 1


def test_resolution_presets_engage_and_match():
    for res, preset in ((14, st.SAMPLE_RES_14BIT),
                        (16, st.SAMPLE_RES_16BIT)):
        frames = _capture(n_frames=6, seed=14, resolution=res)
        hits = _assert_same(frames, corrupt=20, seed=6, want_hits=1,
                            preset_resolution=preset)
        assert hits >= 1, res


def test_m2_engages_and_matches():
    """M2 takes the per-pair fast path with fixed 14-bit modes."""
    frames = _capture(n_frames=6, seed=12)
    hits = _assert_same(frames, corrupt=20, seed=4, want_hits=1,
                        mode_m2=True)
    assert hits >= 1
