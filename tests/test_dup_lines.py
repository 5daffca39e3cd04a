"""Duplicate-line (head-switch copy) handling in the production path.

A duplicated line carries a VALID CRC (it is a bit-exact copy of its
neighbor), so without detection its words enter the deinterleaver as
good data and corrupt six blocks; with detection it is forced bad and
P/Q ECC reconstructs the true words (videotodigital.h:107-110 semantics).
"""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import v2d
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc


def _dup_frame(n_lines=400, dup_at=200):
    # dup_at > MIN_DEINT_DATA so every interleave tap of the duplicated
    # line carries real (non-silent) words — leader lines are exempt via
    # the almost-silent rule, as in the reference.
    rng = np.random.default_rng(9)
    n = 3 * n_lines
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    pixels, coords, words, crcs = enc.encode_stream(
        left, right, width=1152, ppb=8.0, n_lines=n_lines)
    pixels = pixels.copy()
    pixels[dup_at + 1] = pixels[dup_at]  # head-switch duplicate
    return pixels, words, left, right, dup_at


def test_find_duplicate_lines_flags_copy():
    pixels, words, *_ , dup_at = _dup_frame()
    drv = v2d.V2DDriver(hyst_limit=1, shift_limit=1)
    res = drv.decode_frames(pixels[None])[0]
    assert res.duplicates[dup_at + 1]
    assert res.forced_bad[dup_at + 1]
    # no false positives among fully-active lines (the interleave ramp-in
    # can legitimately trigger on mostly-silent lines)
    active = np.zeros(len(res.valid), bool)
    active[112:] = True
    assert res.duplicates[active].sum() == 1


def test_duplicate_not_double_emitted():
    pixels, words, left, right, dup_at = _dup_frame()
    el = np.asarray(stc007.expand_sample(left, xp=np))

    def decode(dup_detect):
        drv = v2d.V2DDriver(hyst_limit=1, shift_limit=1,
                            dup_detect=dup_detect)
        res = drv.decode_frames(pixels[None])[0]
        store = st.LineStore.from_decoded(
            res.words, res.crc_read, res.valid,
            np.ones(len(res.valid)), 1 + 2 * np.arange(len(res.valid)),
            forced_bad=res.forced_bad)
        conv = store
        stitcher = st.STC007Stitcher()
        n = stitcher.perform_deinterleave(conv)
        chunks = stitcher.pop_sample_chunks()
        arr = st.chunks_to_arrays(chunks)
        return arr[0][:, 0].astype(np.int64), arr[1][:, 0]

    out_on, valid_on = decode(True)
    n_chk = min(len(out_on), len(el))
    assert np.array_equal(out_on[:n_chk], el[:n_chk]), \
        "ECC must reconstruct the overwritten line"
    out_off, _ = decode(False)
    assert not np.array_equal(out_off[:n_chk], el[:n_chk]), \
        "without detection the duplicate corrupts samples"


def test_silent_runs_not_flagged():
    # Silence legitimately repeats; almost-silent lines are exempt.
    n_lines = 160
    left = np.zeros(3 * n_lines, np.int64)
    right = np.zeros(3 * n_lines, np.int64)
    pixels, coords, *_ = enc.encode_stream(left, right, width=1152,
                                           ppb=8.0, n_lines=n_lines)
    drv = v2d.V2DDriver(hyst_limit=1, shift_limit=1)
    res = drv.decode_frames(pixels[None])[0]
    assert res.valid.all()
    assert not res.duplicates.any()


def test_silent_m2_lines_not_flagged():
    """Silent M2 lines hold 0x2000 words; the almost-silent exemption
    must use M2 sample expansion or every repeated silent line would be
    forced bad (review regression)."""
    words = np.full((8, 8), 0x2000, np.int64)
    crc = np.asarray(stc007.calc_crc(words, xp=np))
    valid = np.ones(8, bool)
    dup_m2 = v2d.find_duplicate_lines(words, crc, valid, m2=True)
    assert not dup_m2.any()
    # sanity: with the wrong (non-M2) expansion these would all flag
    dup_wrong = v2d.find_duplicate_lines(words, crc, valid, m2=False)
    assert dup_wrong[1:].all()


def test_odd_height_field_boundary():
    """Field 1 holds ceil(H/2) lines: the duplicate tracker must reset at
    the true boundary, not L//2 (review regression)."""
    rng = np.random.default_rng(3)
    L = 9  # odd: field 1 = rows 0..4, field 2 = rows 5..8
    words = rng.integers(0, 1 << 14, size=(L, 8)).astype(np.int64)
    # field 1's last line == field 2's first line: legitimate cross-field
    # similarity, must NOT flag with correct bounds
    words[5] = words[4]
    crc = np.asarray(stc007.calc_crc(words, xp=np))
    half = (L + 1) // 2
    dup = v2d.find_duplicate_lines(words, crc, np.ones(L, bool),
                                   [(0, half), (half, L)])
    assert not dup[5]


def test_native_matches_numpy_twin():
    """Differential fuzz: native stc007_find_dup_lines vs the numpy
    reference path over randomized words/valid masks and field bounds
    (incl. duplicate pairs, near-silent lines, both M2 modes)."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    from sdvpcmdecoder_tpu.pipeline import v2d
    if not sn.available():
        import pytest
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(11)
    for m2 in (False, True):
        for trial in range(20):
            L = int(rng.integers(4, 300))
            words = rng.integers(0, 1 << 14, (L, 8)).astype(np.int64)
            crc_read = rng.integers(0, 1 << 16, L).astype(np.int64)
            valid = rng.random(L) < 0.7
            # Seed exact duplicates and near-silent lines.
            for _ in range(4):
                i = int(rng.integers(1, L))
                words[i] = words[i - 1]
                crc_read[i] = crc_read[i - 1]
            words[rng.integers(0, L, 3)] = rng.integers(0, 4, (3, 8))
            mid = L // 2
            for bounds in (None, [(0, mid), (mid, L)], []):
                exp = _numpy_dup(words, crc_read, valid, bounds, m2)
                got = v2d.find_duplicate_lines(words, crc_read, valid,
                                               bounds, m2=m2)
                np.testing.assert_array_equal(got, exp)


def _numpy_dup(words, crc_read, valid, field_bounds, m2):
    """The pre-native numpy reference, kept verbatim for the fuzz."""
    from sdvpcmdecoder_tpu.pipeline.v2d import _popcount, \
        BIT_DIFF_THRES_DIV
    from sdvpcmdecoder_tpu.formats import stc007
    L = len(valid)
    dup = np.zeros(L, bool)
    thres = stc007.BITS_PCM_DATA // BIT_DIFF_THRES_DIV
    samples = np.asarray(stc007.expand_sample(words[:, :6], m2=m2, xp=np))
    almost_silent = (np.abs(samples.astype(np.int32)) < 16).sum(-1) >= 2
    for lo, hi in (field_bounds or [(0, L)]):
        vi = np.nonzero(valid[lo:hi])[0] + lo
        if len(vi) < 2:
            continue
        a, b = vi[:-1], vi[1:]
        x = (words[a] ^ words[b]).astype(np.uint64)
        c = (crc_read[a] ^ crc_read[b]).astype(np.uint64)
        diff = _popcount(x).sum(axis=-1).astype(np.int64) \
            + _popcount(c).astype(np.int64)
        dup[b] = (diff <= thres) & ~almost_silent[b]
    return dup
