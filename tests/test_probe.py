"""Automatic PCM format detection (pipeline/probe.py)."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1, pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest, probe
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.synth import encoder as enc


def _stc007_frames(rng, n_frames=2, LPF=294, W=1152):
    n = 3 * n_frames * 2 * LPF
    frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                               rng.integers(1, 1 << 14, n), n_frames,
                               lines_pf=LPF)
    vids = []
    for fr in frames:
        px, _ = enc.render_lines(fr["line_words"], fr["crcs"], width=W,
                                 ppb=8.0)
        L = px.shape[0]
        img = np.zeros((L, W), np.uint8)
        img[0::2] = px[:L // 2]
        img[1::2] = px[L // 2:]
        vids.append(img)
    return np.stack(vids)


def _pcm1_frames(rng, n_frames=2, W=1024):
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            sl, sr = di1.interleave_field(
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES),
                rng.integers(0, 1 << 13, di1.FIELD_SUBLINES))
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    return np.stack(vids)


def _pcm16x0_frames(rng, n_frames=2, LPF=245, W=1600):
    usable = (LPF * 3 // (3 * di16.SI_OFS)) * (3 * di16.SI_OFS)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * LPF, W), np.uint8)
        for half in range(2):
            sub, _ = di16.interleave_field(
                rng.integers(1, 1 << 16, usable),
                rng.integers(1, 1 << 16, usable), LPF)
            crcs = pcm16x0.calc_crc(sub, xp=np)
            bits = pcm16x0.line_bits(sub.reshape(LPF, 3, 3),
                                     crcs.reshape(LPF, 3), 1, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=7.0)
            img[half::2] = px
        vids.append(img)
    return np.stack(vids)


@pytest.mark.parametrize("maker,expect", [
    (_stc007_frames, "stc007"),
    (_pcm1_frames, "pcm1"),
    (_pcm16x0_frames, "pcm16x0"),
])
def test_probe_detects_family(maker, expect):
    rng = np.random.default_rng(42)
    fmt, scores = probe.probe_format(maker(rng))
    assert fmt == expect, scores
    assert scores[expect] >= probe.MIN_SCORE


def test_probe_rejects_noise():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 255, size=(2, 128, 1024)).astype(np.uint8)
    fmt, scores = probe.probe_format(noise)
    assert fmt is None, scores


def test_cli_format_auto(tmp_path):
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.pipeline import wav
    rng = np.random.default_rng(7)
    cap = tmp_path / "x.y4m"
    out = tmp_path / "x.wav"
    ingest.write_y4m(cap, _pcm1_frames(rng), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "auto",
               "--quality", "fast"])
    assert rc == 0
    data, _ = wav.read_wav(out)
    assert len(data) and (data != 0).any()


def test_batch_driver_auto_consensus(tmp_path):
    rng = np.random.default_rng(8)
    jobs = []
    for k in range(2):
        p = tmp_path / f"c{k}.y4m"
        ingest.write_y4m(p, _pcm1_frames(rng), chroma="mono")
        jobs.append((str(p), str(tmp_path / f"c{k}.wav")))
    dec = batch_driver.BatchDecoder(jobs, fmt="auto",
                                    frames_per_round=2)
    assert dec.fmt == "pcm1"
    dec.run()
    assert (tmp_path / "c0.wav").exists()


def test_batch_driver_auto_mixed_raises(tmp_path):
    rng = np.random.default_rng(9)
    p1 = tmp_path / "a.y4m"
    p2 = tmp_path / "b.y4m"
    ingest.write_y4m(p1, _pcm1_frames(rng), chroma="mono")
    ingest.write_y4m(p2, _stc007_frames(rng), chroma="mono")
    with pytest.raises(ValueError, match="disagrees"):
        batch_driver.BatchDecoder(
            [(str(p1), str(tmp_path / "a.wav")),
             (str(p2), str(tmp_path / "b.wav"))], fmt="auto")
