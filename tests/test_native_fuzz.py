"""Differential fuzz: the whole STC-007 stitcher with the native core ON
must equal the pure-numpy reference implementation over randomized
captures — field orders, resolutions, crops, corruption, M2, CWD.

This is the guard for the C++ core: any branch divergence in
stitchcore.cpp shows up as a chunk or descriptor mismatch here.
"""
import dataclasses

import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _run_capture(seed, order, resolution, crop, bad_frac, m2, en_cwd,
                 use_native):
    rng = np.random.default_rng(seed)
    n_frames, lpf = 4, 294 if seed % 2 else 245
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(
        rng.integers(1, 1 << (14 if resolution == 14 else 16), n),
        rng.integers(1, 1 << (14 if resolution == 14 else 16), n),
        n_frames, lines_pf=lpf, order=order, bottom_crop=crop,
        resolution=resolution)
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    saved = mod._LIB, mod._TRIED
    if not use_native:
        mod._LIB, mod._TRIED = None, True
    try:
        stitcher = st.STC007Stitcher(mode_m2=m2, en_cwd=en_cwd)
        chunks = []
        for fr in frames:
            nl = len(fr["crcs"])
            v = rng.random(nl) > bad_frac
            words = fr["line_words"].copy()
            corrupt = ~v & (rng.random(nl) < 0.6)
            words[corrupt, rng.integers(0, 8)] ^= 0x155
            s = st.LineStore.from_decoded(
                words, fr["crcs"], v, np.full(nl, fr["frame_number"]),
                fr["line_numbers"])
            stitcher.push_frame(s)
            chunks.extend(stitcher.pop_sample_chunks())
        stitcher.finish()
        chunks.extend(stitcher.pop_sample_chunks())
        arrs = st.chunks_to_arrays(chunks)
        log = [dataclasses.asdict(f) for f in stitcher.frame_log]
        return arrs, log
    finally:
        mod._LIB, mod._TRIED = saved


CASES = [
    # (seed, order, resolution, crop, bad_frac, m2, en_cwd)
    (1, "tff", 14, 0, 0.0, False, False),
    (2, "bff", 14, 6, 0.15, False, False),
    (3, "tff", 16, 3, 0.10, False, False),
    (4, "tff", 14, 0, 0.08, True, False),
    (5, "bff", 14, 10, 0.25, False, True),
    (6, "tff", 14, 2, 0.45, False, True),
]


@pytest.mark.parametrize("case", CASES, ids=[str(c[0]) for c in CASES])
def test_native_stitcher_differential(case):
    seed, order, res, crop, bad, m2, cwd = case
    a, loga = _run_capture(seed, order, res, crop, bad, m2, cwd, True)
    b, logb = _run_capture(seed, order, res, crop, bad, m2, cwd, False)
    assert (a is None) == (b is None)
    if a is not None:
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(x, y)
        assert a[3] == b[3]
    assert loga == logb
