"""Checkpoint/resume beyond STC-007: PCM-1 and PCM-16x0 stitcher state,
CLI kill/resume byte-identical WAVs, and batch-driver round-level resume."""
import numpy as np

from sdvpcmdecoder_tpu.__main__ import main
from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest, wav
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.synth import encoder as enc
from sdvpcmdecoder_tpu.utils import resume


def test_pcm16x0_state_roundtrip(tmp_path):
    s = sp16.PCM16X0Stitcher(auto_fmt=True)
    s.stats_padding = [3, 3, 4]
    s.stats_emph = [True, True, False]
    s.stats_rate = [sp16.SAMPLE_RATE_44056]
    s.stats_code = [False]
    s.stats_mode = [True]
    s.fmt = sp16.FORMAT_EI          # auto-switched mid-run
    s.file_started = True
    resume.save_checkpoint(tmp_path / "c", 11, s, 4321, 44056)
    s2 = sp16.PCM16X0Stitcher()
    fi, sw, rate = resume.load_checkpoint(tmp_path / "c", s2)
    assert (fi, sw, rate) == (11, 4321, 44056)
    assert s2.stats_padding == [3, 3, 4]
    assert s2.stats_emph == [True, True, False]
    assert s2.stats_rate == [sp16.SAMPLE_RATE_44056]
    assert s2.fmt == sp16.FORMAT_EI
    assert s2.file_started


def test_pcm1_state_roundtrip(tmp_path):
    s = sp1.PCM1Stitcher()
    s.file_started = True
    resume.save_checkpoint(tmp_path / "c1", 5, s, 99)
    s2 = sp1.PCM1Stitcher()
    fi, sw, rate = resume.load_checkpoint(tmp_path / "c1", s2)
    assert (fi, sw) == (5, 99)
    assert s2.file_started


def test_kind_mismatch_rejected(tmp_path):
    s = sp1.PCM1Stitcher()
    resume.save_checkpoint(tmp_path / "k", 1, s, 0)
    import pytest
    with pytest.raises(AssertionError):
        resume.load_checkpoint(tmp_path / "k", sp16.PCM16X0Stitcher())


def _pcm1_capture(tmp_path, n_frames=4, W=1024, seed=55):
    rng = np.random.default_rng(seed)
    n = n_frames * 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            base = (f * 2 + half) * di1.FIELD_SUBLINES
            sl, sr = di1.interleave_field(
                left[base:base + di1.FIELD_SUBLINES],
                right[base:base + di1.FIELD_SUBLINES])
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    cap = tmp_path / "cap.y4m"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    return cap


def test_cli_pcm1_kill_resume_byte_identical(tmp_path):
    """Interrupted PCM-1 decode (--frames limit) resumed from its
    checkpoint produces a byte-identical WAV to a single run."""
    cap = _pcm1_capture(tmp_path)
    ref = tmp_path / "ref.wav"
    assert main([str(cap), "-o", str(ref), "--format", "pcm1",
                 "--quality", "fast", "--batch", "2"]) == 0
    out = tmp_path / "out.wav"
    ck = str(tmp_path / "ck")
    # "killed" after 2 frames (the checkpoint survives; the finish tail
    # past the checkpoint is truncated on resume)
    assert main([str(cap), "-o", str(out), "--format", "pcm1",
                 "--quality", "fast", "--batch", "2", "--frames", "2",
                 "--checkpoint", ck]) == 0
    assert main([str(cap), "-o", str(out), "--format", "pcm1",
                 "--quality", "fast", "--batch", "2",
                 "--checkpoint", ck]) == 0
    assert ref.read_bytes() == out.read_bytes()


def _stc_capture(path, n_frames=6, seed=7):
    rng = np.random.default_rng(seed)
    lpf = 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    vids = []
    for fr in frames:
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=1152, ppb=8.0)
        L = pixels.shape[0]
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = pixels[:L // 2]
        img[1::2] = pixels[L // 2:]
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids))


def test_batch_driver_kill_resume(tmp_path):
    """Batch driver killed between rounds resumes from per-job
    checkpoints to a byte-identical WAV."""
    cap = tmp_path / "c.y4m"
    _stc_capture(cap)
    ref = tmp_path / "ref.wav"
    dec = batch_driver.BatchDecoder([(str(cap), str(ref))], hyst_limit=1,
                                    shift_limit=1, frames_per_round=2)
    dec.run()

    out = tmp_path / "out.wav"
    dec1 = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                     shift_limit=1, frames_per_round=2,
                                     checkpoint=True)
    # Simulate a kill: run two rounds by hand, then abandon the decoder.
    pending = None
    for _ in range(2):
        rw = dec1._read_round()
        ctx = dec1._dispatch_round(rw)
        if pending is not None:
            dec1._complete_round(*pending)
        pending = (rw, ctx)
    dec1._complete_round(*pending)
    import os
    assert os.path.exists(str(out) + ".ckpt.json")

    dec2 = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                     shift_limit=1, frames_per_round=2,
                                     checkpoint=True)
    assert dec2.jobs[0].frame_no > 0  # actually resumed
    dec2.run()
    assert ref.read_bytes() == out.read_bytes()
    assert not os.path.exists(str(out) + ".ckpt.json")  # cleaned up


def _pcm16x0_capture(tmp_path, n_frames=4, W=1600, seed=66):
    from sdvpcmdecoder_tpu.formats import pcm16x0
    from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
    rng = np.random.default_rng(seed)
    LPF = sp16.LINES_PF
    usable = (LPF * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    vids = []
    for f in range(n_frames):
        imgs = []
        for parity in range(2):
            left = rng.integers(1, 1 << 16, usable)
            right = rng.integers(1, 1 << 16, usable)
            sub, _ = di16.interleave_field(left, right, LPF)
            crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
            bits = np.stack([
                np.asarray(pcm16x0.line_bits(sub[i * 3:(i + 1) * 3],
                                             crcs[i * 3:(i + 1) * 3],
                                             ctrl_bit=1, xp=np)).ravel()
                for i in range(LPF)])
            px, _ = enc.render_bits(bits, width=W, ppb=8.0)
            imgs.append(px)
        img = np.zeros((2 * LPF, W), np.uint8)
        img[0::2] = imgs[0]
        img[1::2] = imgs[1]
        vids.append(img)
    cap = tmp_path / "cap16.y4m"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    return cap


def test_cli_pcm16x0_kill_resume_byte_identical(tmp_path):
    cap = _pcm16x0_capture(tmp_path)
    ref = tmp_path / "ref16.wav"
    assert main([str(cap), "-o", str(ref), "--format", "pcm16x0",
                 "--quality", "fast", "--batch", "2"]) == 0
    out = tmp_path / "out16.wav"
    ck = str(tmp_path / "ck16")
    assert main([str(cap), "-o", str(out), "--format", "pcm16x0",
                 "--quality", "fast", "--batch", "2", "--frames", "2",
                 "--checkpoint", ck]) == 0
    assert main([str(cap), "-o", str(out), "--format", "pcm16x0",
                 "--quality", "fast", "--batch", "2",
                 "--checkpoint", ck]) == 0
    assert ref.read_bytes() == out.read_bytes()


def _stc_capture_dropout(path, n_frames=6, seed=7):
    """STC-007 capture with a dropout (zeroed lines) spanning frames 2-4
    so the audio masker's carry is live at any early kill point."""
    rng = np.random.default_rng(seed)
    lpf = 294
    n = 3 * n_frames * 2 * lpf
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=lpf)
    vids = []
    for k, fr in enumerate(frames):
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=1152, ppb=8.0)
        L = pixels.shape[0]
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = pixels[:L // 2]
        img[1::2] = pixels[L // 2:]
        if 2 <= k <= 4:
            img[40:L - 40] = 0          # long mid-frame dropout
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids))


def test_native_kill_resume_mid_dropout(tmp_path):
    """Host-backend driver killed while a multi-frame dropout is in
    flight (audio carry non-empty, V2D damping history live) resumes to
    a byte-identical WAV — the full checkpoint-state contract."""
    cap = tmp_path / "cn.y4m"
    _stc_capture_dropout(cap)
    ref = tmp_path / "refn.wav"
    dec = batch_driver.BatchDecoder([(str(cap), str(ref))], hyst_limit=1,
                                    shift_limit=1, frames_per_round=2,
                                    backend="native")
    dec.run()

    out = tmp_path / "outn.wav"
    dec1 = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                     shift_limit=1, frames_per_round=2,
                                     checkpoint=True, backend="native")
    dec1.step_native()
    dec1.step_native()      # kill after round 2: frames 0-3 consumed
    assert dec1.jobs[0].audio.carry_state() is not None  # dropout live
    import os
    assert os.path.exists(str(out) + ".ckpt.json")

    dec2 = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                     shift_limit=1, frames_per_round=2,
                                     checkpoint=True, backend="native")
    assert dec2.jobs[0].frame_no > 0                     # resumed
    assert dec2.jobs[0].driver.state.coord_history       # V2D history back
    dec2.run()
    assert ref.read_bytes() == out.read_bytes()


def test_cross_backend_checkpoint_resume(tmp_path):
    """A checkpoint written by the numpy-only path resumed by the
    native path produces the byte-identical WAV — the checkpoint format
    is backend-portable (a host can gain or lose its compiler
    mid-job)."""
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    cap = tmp_path / "x.y4m"
    _stc_capture_dropout(cap)
    ref = str(tmp_path / "ref.wav")
    dec = batch_driver.BatchDecoder([(str(cap), ref)], hyst_limit=1,
                                    shift_limit=1, frames_per_round=2)
    dec.run()
    out = str(tmp_path / "cross.wav")
    saved = mod._LIB, mod._TRIED
    mod._LIB, mod._TRIED = None, True  # numpy-only first half
    try:
        dec1 = batch_driver.BatchDecoder([(str(cap), out)], hyst_limit=1,
                                         shift_limit=1,
                                         frames_per_round=2,
                                         checkpoint=True)
        dec1.step_native()
        dec1.step_native()
    finally:
        mod._LIB, mod._TRIED = saved
    dec2 = batch_driver.BatchDecoder([(str(cap), out)], hyst_limit=1,
                                     shift_limit=1, frames_per_round=2,
                                     checkpoint=True)
    dec2.run()
    assert open(ref, "rb").read() == open(out, "rb").read()
