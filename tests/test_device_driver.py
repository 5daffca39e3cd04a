"""Chip-resident driver == streaming drivers, byte-identical WAVs.

pipeline.device_driver.DeviceBatchDecoder stages pixels on the device
and decodes rounds with ONE fused dispatch (binarize + dup detection +
speculative seam/res/conv dual evals); the host stage machine verifies
and replays.  Every WAV must equal the native BatchDecoder's output
byte for byte — clean, noisy (marker-fallback frames), and NTSC.
"""
import os

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import batch_driver, device_driver, ingest
from sdvpcmdecoder_tpu.synth import encoder as enc

PAL, NTSC = 294, 245
W = 1152


def _write_capture(tmp, name, n_frames, lpf, seed, noise=0.0):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    vids = []
    for fr in frames:
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=W, ppb=8.0)
        L = pixels.shape[0]
        if noise:
            pixels = np.clip(
                pixels.astype(np.int16)
                + rng.normal(0, noise, pixels.shape), 0, 255) \
                .astype(np.uint8)
        img = np.zeros((L, W), np.uint8)
        img[0::2] = pixels[:L // 2]
        img[1::2] = pixels[L // 2:]
        vids.append(img)
    p = os.path.join(tmp, f"{name}.y4m")
    ingest.write_y4m(p, np.stack(vids))
    return p


def _run(cls, jobs, tmp, tag, lpf, **kw):
    dec = cls(jobs, lines_per_field=lpf, hyst_limit=2, shift_limit=1,
              frames_per_round=5, **kw)
    for k, j in enumerate(dec.jobs):
        j.out_path = os.path.join(tmp, f"{tag}_{k}.wav")
    dec.run()
    return [open(j.out_path, "rb").read() for j in dec.jobs], dec


@pytest.mark.parametrize("lpf,noise,nf", [
    (PAL, 0.0, 12), (PAL, 26.0, 12), (NTSC, 0.0, 10)])
def test_device_driver_matches_native(tmp_path, lpf, noise, nf):
    tmp = str(tmp_path)
    jobs = [(_write_capture(tmp, f"c{i}", nf, lpf, seed=10 * i + 1,
                            noise=noise), os.path.join(tmp, f"o{i}.wav"))
            for i in range(2)]
    ref, _ = _run(batch_driver.BatchDecoder, jobs, tmp, "ref", lpf,
                  backend="native")
    dev, dec = _run(device_driver.DeviceBatchDecoder, jobs, tmp, "dev",
                    lpf)
    for k, (a, b) in enumerate(zip(ref, dev)):
        assert a == b, f"WAV {k} differs (lpf={lpf} noise={noise})"
    if noise == 0.0:
        # the speculative round path must actually engage on clean tape
        for j in dec.jobs:
            assert getattr(j.stitcher, "_steady_chain", None) is not None


def test_device_driver_spec_engagement_counts(tmp_path):
    """On a clean capture nearly every pair must replay from the round
    dispatch's speculative results (no per-pair device traffic): the
    C spec_round consumes whole rounds, the per-pair Python replay
    covers stragglers, and the per-pair device tail stays exceptional."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    tmp = str(tmp_path)
    jobs = [(_write_capture(tmp, "c", 14, PAL, seed=3),
             os.path.join(tmp, "o.wav"))]
    hits = [0, 0, 0]   # [round pairs via spec_round, pair replays, tails]
    orig_round = sn.spec_round
    orig_replay = st.STC007Stitcher._replay_spec_tail
    orig_tail = st.STC007Stitcher._steady_tail_tpu

    def spy_round(*a, **k):
        out = orig_round(*a, **k)
        hits[0] += out[0]
        return out

    def spy_replay(self, *a, **k):
        hits[1] += 1
        return orig_replay(self, *a, **k)

    def spy_tail(self, *a, **k):
        hits[2] += 1
        return orig_tail(self, *a, **k)

    sn.spec_round = spy_round
    st.STC007Stitcher._replay_spec_tail = spy_replay
    st.STC007Stitcher._steady_tail_tpu = spy_tail
    try:
        _run(device_driver.DeviceBatchDecoder, jobs, tmp, "dev", PAL)
    finally:
        sn.spec_round = orig_round
        st.STC007Stitcher._replay_spec_tail = orig_replay
        st.STC007Stitcher._steady_tail_tpu = orig_tail
    # 13 pairs; the first few settle state, the rest ride the device
    # round's speculation — through the C round or the pair replay.
    assert hits[0] + hits[1] >= 10, hits
    assert hits[0] >= 5, hits    # the C round path actually engages
    assert hits[2] <= 2, hits    # per-pair fallback stays exceptional


def test_device_driver_chained_carry(tmp_path):
    """On a clean capture, every round after the first must dispatch
    CHAINED: the pair-0 carry comes from the device's own carry_next
    output (no upload, no host conv-word materialization) and the WAV
    still equals the native decoder byte for byte."""
    from sdvpcmdecoder_tpu.ops import device_stitch as ds
    tmp = str(tmp_path)
    jobs = [(_write_capture(tmp, "c", 12, PAL, seed=1),
             os.path.join(tmp, "o.wav"))]
    ref, _ = _run(batch_driver.BatchDecoder, jobs, tmp, "ref", PAL,
                  backend="native")
    calls = {"chained": 0, "uploaded": 0}
    orig = ds.steady_round_packed

    def spy(*a, **k):
        calls["chained" if k.get("chained") else "uploaded"] += 1
        return orig(*a, **k)

    device_driver.ds.steady_round_packed = spy
    try:
        dev, dec = _run(device_driver.DeviceBatchDecoder, jobs, tmp,
                        "dev", PAL)
    finally:
        device_driver.ds.steady_round_packed = orig
    assert ref[0] == dev[0]
    # 12 frames / 5 per round = 3 rounds; only round 0 may upload.
    assert calls["uploaded"] == 1, calls
    assert calls["chained"] >= 2, calls


def test_device_driver_steady_rounds_never_materialize(tmp_path):
    """Lazy-words invariant: on a clean capture the number of device
    word materializations is a PER-CAPTURE constant (settle-in pairs +
    the finish tail) — steady chained rounds add zero, so doubling the
    frame count must not change the count."""
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    tmp = str(tmp_path)
    counts = {}
    orig_get = st.LineStore.words.fget

    def run_counted(nf):
        n = [0]

        def spy_get(self):
            if self._words is None:
                n[0] += 1
            return orig_get(self)

        st.LineStore.words = property(spy_get, st.LineStore.words.fset)
        try:
            jobs = [(_write_capture(tmp, f"c{nf}", nf, PAL, seed=1),
                     os.path.join(tmp, f"o{nf}.wav"))]
            _run(device_driver.DeviceBatchDecoder, jobs, tmp,
                 f"dev{nf}", PAL)
        finally:
            st.LineStore.words = property(orig_get,
                                          st.LineStore.words.fset)
        return n[0]

    counts[10] = run_counted(10)
    counts[20] = run_counted(20)
    assert counts[20] == counts[10], counts


def test_device_driver_chunked_staging_matches(tmp_path):
    """STC-007 captures longer than one HBM staging chunk decode
    byte-identical to native; the steady chain survives every chunk
    boundary (prev/carry state is device-resident, not pixel-based)."""
    tmp = str(tmp_path)
    jobs = [(_write_capture(tmp, "c", 14, PAL, seed=9),
             os.path.join(tmp, "o.wav"))]
    ref, _ = _run(batch_driver.BatchDecoder, jobs, tmp, "ref", PAL,
                  backend="native")
    dec = device_driver.DeviceBatchDecoder(
        jobs, lines_per_field=PAL, hyst_limit=2, shift_limit=1,
        frames_per_round=4, hbm_frames=4)   # 14 frames -> 4 chunks
    for k, j in enumerate(dec.jobs):
        j.out_path = os.path.join(tmp, f"dev_{k}.wav")
    dec.run()
    assert dec.jobs[0].stage_next == 14
    dev = [open(j.out_path, "rb").read() for j in dec.jobs]
    assert ref[0] == dev[0]


@pytest.mark.parametrize("quality,kw", [
    ("insane", dict(ref_sweep=True, hyst_limit=4, shift_limit=2)),
    ("normal", dict(ref_sweep_fallback=True, normal_sweep_prescan=True,
                    hyst_limit=4, shift_limit=2)),
])
def test_device_driver_quality_sweeps_match_native(tmp_path, quality,
                                                   kw):
    """--quality normal/insane semantics survive on the chip-resident
    path: the ref-level sweep (full grid at insane, failed-lines-only at
    normal) produces WAVs byte-identical to the native backend on a
    noisy synthetic (VERDICT r4 item 6)."""
    tmp = str(tmp_path)
    jobs = [(_write_capture(tmp, "c", 6, PAL, seed=21, noise=30.0),
             os.path.join(tmp, "o.wav"))]

    def run(cls, tag, **extra):
        dec = cls(jobs, lines_per_field=PAL, frames_per_round=3,
                  **kw, **extra)
        for k, j in enumerate(dec.jobs):
            j.out_path = os.path.join(tmp, f"{tag}_{k}.wav")
        dec.run()
        return [open(j.out_path, "rb").read() for j in dec.jobs]

    ref = run(batch_driver.BatchDecoder, "ref", backend="native")
    dev = run(device_driver.DeviceBatchDecoder, "dev")
    assert ref[0] == dev[0], f"WAV differs at quality={quality}"


def test_device_driver_checkpoint_resume(tmp_path):
    """Kill the chip-resident driver mid-capture and resume from the
    checkpoint: the final WAV equals an uninterrupted run byte for byte
    (SURVEY §5 checkpoint/resume applies to the flagship engine; the
    resumed first round re-syncs through the verified fallbacks)."""
    tmp = str(tmp_path)
    cap = _write_capture(tmp, "c", 12, PAL, seed=17)
    ref_out = os.path.join(tmp, "ref.wav")
    dec = device_driver.DeviceBatchDecoder(
        [(cap, ref_out)], lines_per_field=PAL, hyst_limit=2,
        shift_limit=1, frames_per_round=3)
    dec.run()
    ref = open(ref_out, "rb").read()

    out = os.path.join(tmp, "ck.wav")
    kw = dict(lines_per_field=PAL, hyst_limit=2, shift_limit=1,
              frames_per_round=3, checkpoint=True)
    dec1 = device_driver.DeviceBatchDecoder([(cap, out)], **kw)
    j = dec1.jobs[0]
    for _ in range(4):          # a few rounds, then "killed" mid-flight
        dec1._visit(j)
    assert 0 < j.frame_no < 12
    assert os.path.exists(out + ".ckpt.json")

    dec2 = device_driver.DeviceBatchDecoder([(cap, out)], **kw)
    assert dec2.jobs[0].frames_read > 0   # actually resumed
    dec2.run()
    assert open(out, "rb").read() == ref


def test_device_driver_resume_past_chunk_boundary(tmp_path):
    """Resume from a checkpoint BEYOND the first HBM staging chunk:
    staging must restart at the resume frame (not frame 0) and keep
    decoding — a regression here silently truncated the WAV."""
    tmp = str(tmp_path)
    cap = _write_capture(tmp, "c", 14, PAL, seed=23)
    ref_out = os.path.join(tmp, "ref.wav")
    device_driver.DeviceBatchDecoder(
        [(cap, ref_out)], lines_per_field=PAL, hyst_limit=2,
        shift_limit=1, frames_per_round=2, hbm_frames=4).run()
    ref = open(ref_out, "rb").read()

    out = os.path.join(tmp, "ck.wav")
    kw = dict(lines_per_field=PAL, hyst_limit=2, shift_limit=1,
              frames_per_round=2, hbm_frames=4, checkpoint=True)
    dec1 = device_driver.DeviceBatchDecoder([(cap, out)], **kw)
    j = dec1.jobs[0]
    while j.frame_no <= 6:      # run past the first 4-frame chunk
        dec1._visit(j)
    assert 4 < j.frame_no < 14

    dec2 = device_driver.DeviceBatchDecoder([(cap, out)], **kw)
    j2 = dec2.jobs[0]
    assert j2.frames_read > 4               # resumed past chunk 0
    assert j2.chunk_base == j2.frames_read  # staged from the resume point
    dec2.run()
    assert j2.frames_read == 14             # decoded to the end
    assert open(out, "rb").read() == ref


def test_pal_576_line_capture_presets_pal():
    """576-line captures (288 lines/field) are PAL: the preset rule is
    the detectVideoStandard field-height threshold, not an exact-294
    match (stc007datastitcher.cpp:2773)."""
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    dec = batch_driver.BatchDecoder.__new__(batch_driver.BatchDecoder)
    # exercise just the preset rule via a stub constructor run
    for lpf, expect in ((294, st.VID_PAL), (288, st.VID_PAL),
                        (245, st.VID_NTSC), (240, st.VID_NTSC)):
        preset = st.VID_PAL if lpf > 260 else st.VID_NTSC
        assert preset == expect
    # and the real constructor derives it from the reader height
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        cap = _write_capture(tmp, "p576", 2, 288, seed=3)
        d = batch_driver.BatchDecoder([(cap, os.path.join(tmp, "o.wav"))],
                                      lines_per_field=None,
                                      backend="native")
        assert d.jobs[0].stitcher.preset_video == st.VID_PAL


def test_batch_decoder_preset_wiring(tmp_path):
    """mode_m2 and the user presets reach the stitcher/V2D (the device
    CLI passes them through; they used to be silently dropped, so
    --format m2 --backend device decoded in STC-007 auto mode)."""
    from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
    cap = _write_capture(str(tmp_path), "m", 2, PAL, seed=5)
    d = batch_driver.BatchDecoder(
        [(cap, str(tmp_path / "o.wav"))], backend="native",
        mode_m2=True, preset_order=st.ORDER_BFF, preset_resolution=2,
        preset_sample_rate=44100)
    j = d.jobs[0]
    assert j.stitcher.mode_m2 and not j.stitcher.auto_m2
    assert j.stitcher.preset_order == st.ORDER_BFF
    assert j.stitcher.preset_resolution == 2
    assert j.stitcher.preset_sample_rate == 44100
    assert j.driver.m2
