"""PCM-1 path tests: interleave map round-trip, field decode, stitcher."""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1


def test_pair_map_bijective():
    m = di1.pair_to_subline_map()
    flat = m.reshape(-1)
    used = flat[flat >= 0]
    assert len(used) == di1.FIELD_SUBLINES
    assert len(np.unique(used)) == di1.FIELD_SUBLINES
    assert used.min() == 0 and used.max() == di1.FIELD_SUBLINES - 1
    # The single absent pair is the last of the short block.
    assert m[7, 91] == -1


def test_interleave_roundtrip():
    rng = np.random.default_rng(0)
    left = rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES)
    right = rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES)
    sl, sr = di1.interleave_field(left, right)
    out = di1.deinterleave_field(sl, sr, np.ones(di1.FIELD_SUBLINES, bool))
    np.testing.assert_array_equal(out["left"], left)
    np.testing.assert_array_equal(out["right"], right)
    assert out["valid"].all() and out["block_valid"].all()


def test_block_invalidation_scoped():
    rng = np.random.default_rng(1)
    left = rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES)
    right = rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES)
    sl, sr = di1.interleave_field(left, right)
    ok = np.ones(di1.FIELD_SUBLINES, bool)
    ok[100] = False  # one bad subline -> block 1 invalid
    out = di1.deinterleave_field(sl, sr, ok)
    assert int(np.sum(~out["valid"])) == 1
    bad_pairs = np.nonzero(~out["block_valid"])[0]
    assert (bad_pairs // di1.BLOCK_PAIRS == 1).all()


def _encode_pcm1_frame(left, right, frame_number=1, order="tff",
                       with_header=True):
    """Samples -> PCM1LineStore for one frame (both fields)."""
    stores = []
    if with_header:
        hdr = sp1.PCM1LineStore(2)
        hdr.service[:] = sp1.SRV_HEADER
        hdr.frame_number[:] = frame_number
        hdr.line_number[:] = [1, 2]
        stores.append(hdr)
    S = di1.FIELD_SUBLINES
    for half, parity in enumerate(("odd", "even") if order == "tff"
                                  else ("even", "odd")):
        lw = pcm1.expand_sample  # noqa: F841 (doc anchor)
        l13 = left[half * S:(half + 1) * S]
        r13 = right[half * S:(half + 1) * S]
        sl, sr = di1.interleave_field(l13, r13)
        words = np.zeros((sp1.LINES_PF, 6), dtype=np.int64)
        words[:, 0] = sl[0::3]
        words[:, 1] = sr[0::3]
        words[:, 2] = sl[1::3]
        words[:, 3] = sr[1::3]
        words[:, 4] = sl[2::3]
        words[:, 5] = sr[2::3]
        crcs = pcm1.calc_crc(words, xp=np)
        base = 1 if parity == "odd" else 2
        nums = base + 2 * np.arange(sp1.LINES_PF)
        # Header occupies lines 1-2; shift data down to start at line 3/4.
        if with_header:
            nums = nums + 2
        st = sp1.PCM1LineStore.from_decoded(
            words, crcs, np.full(sp1.LINES_PF, frame_number), nums)
        stores.append(st)
    return sp1.PCM1LineStore.concat(stores)


def test_pcm1_stitcher_roundtrip():
    rng = np.random.default_rng(2)
    n = 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    store = _encode_pcm1_frame(left, right, with_header=True)
    tag = sp1.PCM1LineStore(1)
    tag.service[0] = sp1.SRV_NEW_FILE
    tag.frame_number[0] = 1
    store = sp1.PCM1LineStore.concat([tag, store])
    s = sp1.PCM1Stitcher()
    s.push_frame(store)
    pairs = [p for p in s.pop_samples() if p.service == sp1.SRV_NO]
    assert len(pairs) == n
    el = np.asarray(pcm1.expand_sample(left, xp=np))
    er = np.asarray(pcm1.expand_sample(right, xp=np))
    out_l = np.array([p.left for p in pairs])
    out_r = np.array([p.right for p in pairs])
    np.testing.assert_array_equal(out_l, el)
    np.testing.assert_array_equal(out_r, er)
    assert all(p.left_valid and p.right_valid for p in pairs)
    fr = s.frame_log[0]
    assert fr.blocks_drop == 0
    assert fr.blocks_total == 16


def test_pcm1_stitcher_bad_line_flags():
    rng = np.random.default_rng(3)
    n = 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    store = _encode_pcm1_frame(left, right)
    # Corrupt one line's CRC.
    data_rows = np.nonzero(store.service == sp1.SRV_NO)[0]
    store.source_crc[data_rows[40]] ^= 0xFFFF
    s = sp1.PCM1Stitcher()
    s.push_frame(store)
    pairs = [p for p in s.pop_samples() if p.service == sp1.SRV_NO]
    invalid = [p for p in pairs if not p.left_valid]
    assert len(invalid) == 3  # one line = 3 sublines = 3 pairs
    fr = s.frame_log[0]
    assert fr.blocks_drop >= 1 and fr.samples_drop == 3


def test_native_field_deint_matches_numpy():
    """pcm1_field_deint (gather + companding + stats in C) == the numpy
    deinterleave_field + expand_sample tail, including the short-block
    pair drop and the stat reduces."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    if not sn.available():
        import pytest
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(3)
    for trial in range(6):
        sl = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
        sr = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
        sv = rng.random(di1.FIELD_SUBLINES) > (0.15 * trial)
        out = di1.deinterleave_field(sl, sr, sv)
        left = np.asarray(pcm1.expand_sample(out["left"], xp=np))
        right = np.asarray(pcm1.expand_sample(out["right"], xp=np))
        ref_samples = np.stack([left, right], axis=1)
        ref_v2 = np.repeat(out["valid"][:, None], 2, axis=1)
        ref_bok = np.asarray(out["block_valid"], bool)
        ref_bad = len(np.unique(
            np.nonzero(~out["block_valid"])[0] // di1.BLOCK_PAIRS))
        ref_drop = int(np.sum(~out["valid"]))
        samples, v2, bok, bad, sdrop = sn.pcm1_field_deint(sl, sr, sv)
        np.testing.assert_array_equal(samples, ref_samples)
        np.testing.assert_array_equal(v2, ref_v2)
        np.testing.assert_array_equal(bok, ref_bok)
        assert (bad, sdrop) == (ref_bad, ref_drop), trial


def test_find_trim_native_matches_numpy():
    """PCM-1 _find_trim native scan == the numpy reference (no-header
    frames), across corruption, forced-bad rows and manual offsets."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    if not sn.available():
        import pytest
        pytest.skip("native core unavailable")
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    rng = np.random.default_rng(9)
    for trial in range(6):
        n = 2 * sp1.LINES_PF
        words = rng.integers(0, 1 << 13, (n, 6))
        crcs = np.asarray(pcm1.calc_crc(words, xp=np))
        bad = rng.random(n) < (0.1 * trial)
        crcs = np.where(bad, crcs ^ 0x5A5A, crcs)
        store = sp1.PCM1LineStore.from_decoded(
            words, crcs, np.ones(n), 1 + np.arange(n))
        store.forced_bad[:] = rng.random(n) < 0.05
        store.bw_set[:] = rng.random(n) > 0.02
        kw = {} if trial % 2 else dict(auto_offset=False, odd_offset=3,
                                       even_offset=2)
        def run(native):
            saved = mod._LIB, mod._TRIED
            if not native:
                mod._LIB, mod._TRIED = None, True
            try:
                s = sp1.PCM1Stitcher(**kw)
                fr = sp1.FrameAsmPCM1()
                fr.frame_number = 1
                st2 = store.take(np.arange(n))
                s._find_trim(st2, fr)
                return (s.file_start, s.file_end, s.header_present,
                        s.emphasis_set, fr.even_top_data,
                        fr.even_bottom_data, fr.odd_top_data,
                        fr.odd_bottom_data)
            finally:
                mod._LIB, mod._TRIED = saved
        assert run(True) == run(False), trial
