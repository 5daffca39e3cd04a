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


@pytest.mark.parametrize("seed,crop,bad,fmt", [
    (11, 0, 0.0, "si"), (12, 5, 0.2, "si"), (13, 9, 0.5, "si"),
    (14, 0, 0.1, "ei"),
])
def test_native_pcm16x0_stitcher_differential(seed, crop, bad, fmt):
    """Whole PCM-16x0 stitcher with the native decode ON == numpy."""
    from sdvpcmdecoder_tpu.formats import pcm16x0
    from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16

    def run(use_native):
        rng = np.random.default_rng(seed)
        lpf = sp16.LINES_PF
        ei = fmt == "ei"
        stores = []
        for parity_base in (1, 2):
            if ei:
                npairs = di16.EI_OFS * 3
                sub, _ = di16.interleave_field(
                    rng.integers(1, 1 << 16, npairs),
                    rng.integers(1, 1 << 16, npairs), 2 * lpf, ei=True)
                sub = sub[:lpf * 3]
            else:
                usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) \
                    * sp16.SI_TRUE_INTERLEAVE
                sub, _ = di16.interleave_field(
                    rng.integers(1, 1 << 16, usable),
                    rng.integers(1, 1 << 16, usable), lpf)
            sub = sub[3 * crop:].copy()
            crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
            flip = rng.random(len(sub)) < bad
            crcs[flip] ^= 0x700
            stores.append(sp16.PCM16X0LineStore.from_decoded(
                sub, crcs, np.full(len(sub), 1),
                parity_base + 2 * (crop + np.arange(len(sub)) // 3),
                np.arange(len(sub)) % 3,
                control_bit=rng.random(len(sub)) < 0.5))
        import sdvpcmdecoder_tpu.ops.stitch_native as mod
        saved = mod._LIB, mod._TRIED
        if not use_native:
            mod._LIB, mod._TRIED = None, True
        try:
            s = sp16.PCM16X0Stitcher(
                fmt=sp16.FORMAT_EI if ei else sp16.FORMAT_SI)
            s.push_frame(sp16.PCM16X0LineStore.concat(stores))
            chunks = s.pop_sample_chunks()
            arrs = sp16.SampleChunk  # noqa: anchor
            from sdvpcmdecoder_tpu.pipeline.stitcher_stc007 import \
                chunks_to_arrays
            out = chunks_to_arrays(chunks)
            log = [dataclasses.asdict(f) for f in s.frame_log]
            return out, log
        finally:
            mod._LIB, mod._TRIED = saved

    a, loga = run(True)
    b, logb = run(False)
    assert (a is None) == (b is None)
    if a is not None:
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(x, y)
        assert a[3] == b[3]
    assert loga == logb
