"""Native whole-seam eval (stc007_eval_rows) == numpy eval_rows."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _store(rng, n_lines, bad_frac=0.2, resolution=14, m2=False):
    left = rng.integers(0, 1 << 14, size=3 * n_lines)
    right = rng.integers(0, 1 << 14, size=3 * n_lines)
    # silence runs to exercise the silent flag
    left[: 3 * 20] = 0
    right[: 3 * 20] = 0
    to_blocks = enc.samples_to_blocks16 if resolution == 16 \
        else enc.samples_to_blocks
    blocks = to_blocks(left, right)
    words, crcs = enc.blocks_to_lines(blocks, n_lines,
                                      resolution=resolution)
    store = st.LineStore(n_lines)
    store.words = np.asarray(words, np.int64)
    store.source_crc = np.asarray(crcs, np.int64)
    v = rng.random(n_lines) > bad_frac
    # corrupt some words on bad lines
    corrupt = ~v & (rng.random(n_lines) < 0.7)
    store.words[corrupt, rng.integers(0, 8)] ^= 0x1234
    store.word_crc[:] = v[:, None]
    # some per-word variety
    pw = rng.random((n_lines, 9)) < 0.05
    store.word_crc ^= pw
    store.word_valid[:] = store.word_crc
    store.frame_number[:] = 1
    store.line_number = 1 + 2 * np.arange(n_lines)
    store.coords_valid[:] = True
    store.bw_set[:] = True
    store.forced_bad = rng.random(n_lines) < 0.03
    return store


def _numpy_eval(store, rows, mode, **kw):
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    saved = mod._LIB, mod._TRIED
    mod._LIB, mod._TRIED = None, True
    try:
        return st.eval_rows(store, rows, mode, **kw)
    finally:
        mod._LIB, mod._TRIED = saved


def _compare(store, rows, mode, **kw):
    b_np, c_np, a_np = _numpy_eval(store, rows, mode, **kw)
    b_nat, c_nat, a_nat = st.eval_rows(store, rows, mode, **kw)
    for f in b_np._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(b_np, f)), np.asarray(getattr(b_nat, f)),
            err_msg=f"BlockBatch.{f} mode={mode} kw={kw}")
    np.testing.assert_array_equal(c_np, c_nat)
    for k in ("broken", "block_valid", "can_force", "silent", "fixed_p",
              "fixed_q", "samples", "start_frame", "start_line",
              "stop_frame", "stop_line", "errors_audio_fixed"):
        np.testing.assert_array_equal(
            np.asarray(a_np[k]), np.asarray(a_nat[k]),
            err_msg=f"aux[{k}] mode={mode} kw={kw}")


@pytest.mark.parametrize("mode", [di.RES_MODE_14BIT, di.RES_MODE_16BIT,
                                  di.RES_MODE_14BIT_AUTO,
                                  di.RES_MODE_16BIT_AUTO])
def test_eval_rows_native_matches_numpy(mode):
    rng = np.random.default_rng(mode)
    res = 16 if mode in (di.RES_MODE_16BIT, di.RES_MODE_16BIT_AUTO) else 14
    store = _store(rng, 300, resolution=res)
    B = len(store) - stc007.MIN_DEINT_DATA
    shifts = np.arange(B)
    rows = shifts[:, None] + (np.arange(8) * stc007.INTERLEAVE_OFS)[None, :]
    _compare(store, rows, mode)
    _compare(store, rows, mode, force_ecc=False)
    _compare(store, rows, mode, en_q=False)
    _compare(store, rows, mode, en_p=False, en_q=False)
    _compare(store, rows, mode, ignore_crc=True)


def test_eval_rows_native_cwd_and_m2():
    rng = np.random.default_rng(99)
    store = _store(rng, 260)
    # mark some lines CWD-fixed: word flags valid beyond source CRC
    idx = rng.integers(0, len(store), 30)
    store.word_crc[idx, :3] = False
    store.word_valid[idx] = True
    B = len(store) - stc007.MIN_DEINT_DATA
    rows = np.arange(B)[:, None] \
        + (np.arange(8) * stc007.INTERLEAVE_OFS)[None, :]
    _compare(store, rows, di.RES_MODE_14BIT_AUTO, en_cwd=True)
    _compare(store, rows, di.RES_MODE_14BIT, m2=True)


def test_stitcher_output_native_vs_numpy(monkeypatch):
    """Whole-stitcher equivalence: same SampleChunks with and without
    the native core."""
    rng = np.random.default_rng(5)
    n_frames, lpf = 6, 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf, bottom_crop=8)

    def run():
        stitcher = st.STC007Stitcher(preset_video=st.VID_PAL, en_cwd=True)
        out = []
        for fr in frames:
            v = np.ones(len(fr["crcs"]), bool)
            v[rng.integers(0, len(v), 40)] = False  # deterministic per rng
            s = st.LineStore.from_decoded(
                fr["line_words"], fr["crcs"], v,
                np.full(len(fr["crcs"]), fr["frame_number"]),
                fr["line_numbers"])
            stitcher.push_frame(s)
            out.extend(stitcher.pop_sample_chunks())
        stitcher.finish()
        out.extend(stitcher.pop_sample_chunks())
        return st.chunks_to_arrays(out)

    rng = np.random.default_rng(5)
    nat = run()
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    saved = mod._LIB, mod._TRIED
    mod._LIB, mod._TRIED = None, True
    try:
        rng = np.random.default_rng(5)
        ref = run()
    finally:
        mod._LIB, mod._TRIED = saved
    assert (ref is None) == (nat is None)
    for a, b in zip(ref[:3], nat[:3]):
        np.testing.assert_array_equal(a, b)
    assert ref[3] == nat[3]


def test_field_res_counts_native_matches_python():
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as stm
    for seed, res, bad in ((0, 14, 0.1), (1, 16, 0.1), (2, 14, 0.5)):
        rng = np.random.default_rng(seed)
        fld = _store(rng, 220, bad_frac=bad, resolution=res)
        s1 = stm.STC007Stitcher()
        r_native = s1.get_field_resolution(fld)
        import sdvpcmdecoder_tpu.ops.stitch_native as mod
        saved = mod._LIB, mod._TRIED
        mod._LIB, mod._TRIED = None, True
        try:
            fld2 = fld.take(np.arange(len(fld)))  # fresh memo/caches
            s2 = stm.STC007Stitcher()
            r_py = s2.get_field_resolution(fld2)
        finally:
            mod._LIB, mod._TRIED = saved
        assert r_native == r_py, (seed, res, bad, r_native, r_py)


def test_deint_fused_matches_numpy():
    """Fused stc007_deint_finalize == the numpy perform_deinterleave
    tail: SampleChunk contents, frame stats counters and the carried
    BROKEN countdown, across resolutions, masking gates and CWD/M2."""
    cases = ((0, 0.15, 0, False, False, 14, False),
             (1, 0.50, 7, False, True, 14, True),
             (2, 0.35, 3, True, False, 16, False))
    for seed, bad, dur, m2, cwd, res, fend in cases:
        rng = np.random.default_rng(seed)
        store = _store(rng, 320, bad_frac=bad, resolution=res)

        def run(native):
            import sdvpcmdecoder_tpu.ops.stitch_native as mod
            saved = mod._LIB, mod._TRIED
            if not native:
                mod._LIB, mod._TRIED = None, True
            try:
                s = st.STC007Stitcher(en_cwd=cwd, mode_m2=m2,
                                      broken_mask_dur=dur)
                s.broken_countdown = 2
                s.file_start = True
                s.file_end = fend
                fa, f0, fb = s.frasm_f1, s.frasm_f0, s.frasm_f2
                fa.frame_number = 1
                f0.frame_number = 1
                fb.frame_number = 2
                conv = store.take(np.arange(len(store)))
                n = s.perform_deinterleave(conv)
                chunk = s.out_chunks[-1]
                return (n, chunk, s.broken_countdown, fa.blocks_total,
                        fa.blocks_fix_p, fa.blocks_fix_q,
                        fa.blocks_fix_cwd, fa.blocks_drop,
                        fa.samples_drop, fa.blocks_broken_field)
            finally:
                mod._LIB, mod._TRIED = saved

        got, ref = run(True), run(False)
        assert got[0] == ref[0], (seed, "n_blocks")
        for f in ("samples", "valid", "fixed", "block_ok"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got[1], f)),
                np.asarray(getattr(ref[1], f)),
                err_msg=f"chunk.{f} seed={seed}")
        assert got[1].sample_rate == ref[1].sample_rate
        assert got[1].emphasis == ref[1].emphasis
        assert got[2:] == ref[2:], (seed, got[2:], ref[2:])
