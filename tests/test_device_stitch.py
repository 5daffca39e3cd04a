"""Device (XLA) seam sweep == native/numpy try_padding, bit-for-bit.

Pins ops.device_stitch.seam_sweep (the --backend tpu seam evaluator,
reference tryPadding stc007datastitcher.cpp:1417 / findPadding :1743)
against the existing host paths on clean/noisy/16-bit/M2 seams.
Runs on the CPU JAX backend (conftest pins JAX_PLATFORMS=cpu).
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di
from sdvpcmdecoder_tpu.ops import device_stitch as ds
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc

MODES = (di.RES_MODE_14BIT, di.RES_MODE_14BIT_AUTO,
         di.RES_MODE_16BIT, di.RES_MODE_16BIT_AUTO)


def _field(rng, n, fno, start_line, bad_frac, res=14):
    left = rng.integers(0, 1 << (14 if res == 14 else 16), size=3 * n)
    right = rng.integers(0, 1 << (14 if res == 14 else 16), size=3 * n)
    to_blocks = enc.samples_to_blocks if res == 14 \
        else enc.samples_to_blocks16
    blocks = to_blocks(left, right)
    words, crcs = enc.blocks_to_lines(blocks, n, resolution=res)
    s = st.LineStore(n)
    s.words = np.asarray(words, np.int64)
    s.source_crc = np.asarray(crcs, np.int64)
    v = rng.random(n) > bad_frac
    s.word_crc[:] = v[:, None]
    s.forced_bad[:] = rng.random(n) < 0.05
    s.frame_number[:] = fno
    s.line_number[:] = start_line + 2 * np.arange(n)
    return s


def _device_sweep_stats(sti, f1, f2, max_padding):
    """batched_padding_stats via the device sweep (what the tpu seam
    backend runs): host symbolic res modes + one jitted dispatch."""
    modes = np.full(max_padding, -1, np.int32)
    for p in range(max_padding):
        m = sti._seam_res_mode(f1, f2, p)
        if m is not None:
            modes[p] = m
    unch = sti.max_unch_14 if sti.en_q else sti.max_unch_16
    stats, has = ds.seam_sweep(
        f1.words_i32(), f1.crc_ok8(), f2.words_i32(), f2.crc_ok8(),
        sti._silent_words32(), modes, sti.en_p, sti.en_q, sti.mode_m2,
        unch)
    return [st.StitchStats(index=p, valid=int(stats[p, 0]),
                           silent=int(stats[p, 1]),
                           unchecked=int(stats[p, 2]),
                           broken=int(stats[p, 3]))
            if has[p] else None for p in range(max_padding)]


@pytest.mark.parametrize("n1,n2,bad,res", [
    (294, 294, 0.05, 14), (240, 280, 0.3, 14), (130, 294, 0.0, 14),
    (294, 100, 0.6, 14), (294, 294, 0.1, 16), (60, 294, 0.2, 14),
])
def test_device_sweep_matches_host(n1, n2, bad, res):
    rng = np.random.default_rng(n1 + n2)
    sti = st.STC007Stitcher()
    sti.frasm_f1.frame_number = 1
    sti.frasm_f2.frame_number = 2
    if res == 16:
        for fr in (sti.frasm_f0, sti.frasm_f1, sti.frasm_f2):
            fr.odd_resolution = di.RES_MODE_16BIT
            fr.even_resolution = di.RES_MODE_16BIT
    f1 = _field(rng, n1, 1, 1, bad, res)
    f2 = _field(rng, n2, 2, 1, bad, res)
    host = sti.batched_padding_stats(f1, f2, 32)
    dev = _device_sweep_stats(sti, f1, f2, 32)
    for p, (a, b) in enumerate(zip(host, dev)):
        if a is None or b is None:
            assert a is None and b is None, p
            continue
        assert (a.valid, a.silent, a.unchecked, a.broken) == \
            (b.valid, b.silent, b.unchecked, b.broken), (p, a, b)


def test_device_sweep_fuzz_configs():
    """Random configs incl. M2, en_p/en_q toggles and mixed frame
    resolutions (the per-pad mode array exercises every branch of the
    in-kernel resolution select)."""
    rng = np.random.default_rng(11)
    for trial in range(25):
        n1 = int(rng.integers(0, 160))
        n2 = int(rng.integers(0, 160))
        res = 14 if rng.random() < 0.7 else 16
        sti = st.STC007Stitcher()
        sti.mode_m2 = bool(rng.random() < 0.2)
        sti.en_p = bool(rng.random() < 0.9)
        sti.en_q = bool(rng.random() < 0.9)
        sti.frasm_f1.frame_number = int(rng.integers(0, 3))
        sti.frasm_f2.frame_number = int(rng.integers(0, 3))
        for fr in (sti.frasm_f0, sti.frasm_f1, sti.frasm_f2):
            fr.odd_resolution = MODES[rng.integers(0, 4)]
            fr.even_resolution = MODES[rng.integers(0, 4)]
        f1 = _field(rng, n1, int(rng.integers(0, 3)), 1,
                    rng.random() * 0.5, res)
        f2 = _field(rng, n2, int(rng.integers(0, 3)),
                    0 if rng.random() < 0.5 else 2,
                    rng.random() * 0.5, res)
        dev = _device_sweep_stats(sti, f1, f2, 32)
        for p in range(32):
            verdict, st_s = sti.try_padding(f1, f2, p)
            b = dev[p]
            if st_s is None or b is None:
                assert st_s is None and b is None, (trial, p, st_s, b)
                continue
            assert (st_s.valid, st_s.silent, st_s.unchecked,
                    st_s.broken) == (b.valid, b.silent, b.unchecked,
                                     b.broken), (trial, p)


def _full_decode(frames, corrupt, seed, **kw):
    """Full slow-path decode -> (chunk arrays, frame log)."""
    import dataclasses
    rng = np.random.default_rng(seed)
    s = st.STC007Stitcher(**kw)
    s._try_steady_pair = lambda: False
    s._try_steady_run = lambda: False
    for fr in frames:
        v = np.ones(len(fr["crcs"]), bool)
        if corrupt:
            v[rng.integers(0, len(v), corrupt)] = False
        s.push_frame(st.LineStore.from_decoded(
            fr["line_words"], fr["crcs"], v,
            np.full(len(fr["crcs"]), fr["frame_number"]),
            fr["line_numbers"]))
    s.finish()
    arr = st.chunks_to_arrays(s.pop_sample_chunks())
    log = [dataclasses.asdict(f) for f in s.frame_log]
    return arr, log


def test_full_decode_tpu_seam_backend_identical():
    """A noisy full decode with seam_backend="tpu" (device padding
    sweeps driving findPadding/findFieldStitching) equals the host
    backend on chunks and every frame-log field."""
    rng = np.random.default_rng(21)
    n_frames, lpf = 8, 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    a = _full_decode(frames, corrupt=60, seed=5)
    b = _full_decode(frames, corrupt=60, seed=5, seam_backend="tpu")
    assert (a[0] is None) == (b[0] is None)
    if a[0] is not None:
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y)
        assert a[0][3] == b[0][3]
    assert a[1] == b[1]


@pytest.mark.parametrize("res,corrupt", [(16, 40), (14, 0)])
def test_full_decode_tpu_backend_res_and_steady(res, corrupt):
    """16-bit capture (S-word assembly + per-pad 16-bit modes on
    device), and a clean capture where the host side takes the native
    steady fast path while the tpu backend runs the full slow path on
    the device — outputs must still be identical."""
    rng = np.random.default_rng(31 + res)
    n_frames, lpf = 8, 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << (res - 2), n),
                               rng.integers(1, 1 << (res - 2), n),
                               n_frames, lines_pf=lpf, resolution=res)
    import dataclasses

    def run(**kw):
        rng2 = np.random.default_rng(9)
        s = st.STC007Stitcher(**kw)
        for fr in frames:
            v = np.ones(len(fr["crcs"]), bool)
            if corrupt:
                v[rng2.integers(0, len(v), corrupt)] = False
            s.push_frame(st.LineStore.from_decoded(
                fr["line_words"], fr["crcs"], v,
                np.full(len(fr["crcs"]), fr["frame_number"]),
                fr["line_numbers"]))
        s.finish()
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        return arr, [dataclasses.asdict(f) for f in s.frame_log]

    a = run()
    b = run(seam_backend="tpu")
    assert (a[0] is None) == (b[0] is None)
    if a[0] is not None:
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y)
        assert a[0][3] == b[0][3]
    assert a[1] == b[1]


def test_tpu_steady_tail_engages_and_matches():
    """Clean capture: the device steady tail (_steady_tail_tpu) must
    engage on most pairs and produce output identical to the host
    machine; a mid-stream knockout frame must bail to the slow path
    and recover (both still on the device backend)."""
    import dataclasses
    rng = np.random.default_rng(77)
    n_frames, lpf = 10, 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)

    def run(knockout=None, **kw):
        rng2 = np.random.default_rng(13)
        s = st.STC007Stitcher(**kw)
        hits = [0]
        if kw.get("seam_backend") == "tpu":
            orig = st.STC007Stitcher._try_steady_pair

            def spy(_s=s):
                r = orig(_s)
                if r:
                    hits[0] += 1
                return r
            s._try_steady_pair = spy
        for k, fr in enumerate(frames):
            v = np.ones(len(fr["crcs"]), bool)
            if knockout is not None and k == knockout:
                v[rng2.integers(0, len(v), 300)] = False
            s.push_frame(st.LineStore.from_decoded(
                fr["line_words"], fr["crcs"], v,
                np.full(len(fr["crcs"]), fr["frame_number"]),
                fr["line_numbers"]))
        s.finish()
        arr = st.chunks_to_arrays(s.pop_sample_chunks())
        return arr, [dataclasses.asdict(f) for f in s.frame_log], hits[0]

    for ko in (None, 5):
        a = run(knockout=ko)
        b = run(knockout=ko, seam_backend="tpu")
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y, err_msg=f"ko={ko}")
        assert a[0][3] == b[0][3]
        assert a[1] == b[1], f"ko={ko}"
        assert b[2] >= (5 if ko is None else 3), (ko, b[2])
