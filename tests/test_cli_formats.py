"""CLI end-to-end for the PCM-1 and PCM-1630 (EI) formats."""
import numpy as np

from sdvpcmdecoder_tpu.__main__ import main
from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1, pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import ingest, wav
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.synth import encoder as enc


def test_cli_pcm1(tmp_path):
    rng = np.random.default_rng(101)
    W = 1024
    n_frames = 2
    n = n_frames * 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):  # odd field then even (TFF)
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
    cap = tmp_path / "p1.y4m"
    out = tmp_path / "p1.wav"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "pcm1",
               "--quality", "fast"])
    assert rc == 0
    data, rate = wav.read_wav(out)
    el = np.asarray(pcm1.expand_sample(left, xp=np)).astype(np.int64)
    o = data[:, 0].astype(np.int64)
    assert len(o) == n
    np.testing.assert_array_equal(o, el)


def test_cli_pcm1630(tmp_path):
    rng = np.random.default_rng(102)
    W = 1600
    LPF = 245
    usable = di16.EI_OFS * 3
    n_frames = 2
    lefts, vids = [], []
    for f in range(n_frames):
        left = rng.integers(1, 1 << 16, size=usable)
        right = rng.integers(1, 1 << 16, size=usable)
        lefts.append(left)
        sub, _ = di16.interleave_field(left, right, 2 * LPF, ei=True)
        crcs = pcm16x0.calc_crc(sub, xp=np)
        bits = pcm16x0.line_bits(sub.reshape(2 * LPF, 3, 3),
                                 crcs.reshape(2 * LPF, 3), 0, xp=np)
        px, _ = enc.render_bits(bits, width=W, ppb=7.0)
        img = np.zeros((2 * LPF, W), np.uint8)
        img[0::2] = px[:LPF]
        img[1::2] = px[LPF:]
        vids.append(img)
    cap = tmp_path / "ei.y4m"
    out = tmp_path / "ei.wav"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "pcm1630",
               "--quality", "fast"])
    assert rc == 0
    data, rate = wav.read_wav(out)
    el = np.asarray(pcm16x0.expand_sample(
        np.concatenate(lefts), xp=np)).astype(np.int64)
    o = data[:, 0].astype(np.int64)
    np.testing.assert_array_equal(o[:len(el)], el[:len(o)])


def test_cli_pcm16x0_si(tmp_path):
    rng = np.random.default_rng(103)
    W = 1600
    LPF = 245
    usable = (LPF * 3 // (3 * di16.SI_OFS)) * (3 * di16.SI_OFS)
    n_frames = 2
    lefts, vids = [], []
    for f in range(n_frames):
        img = np.zeros((2 * LPF, W), np.uint8)
        for half in range(2):  # odd then even field (TFF)
            left = rng.integers(1, 1 << 16, size=usable)
            right = rng.integers(1, 1 << 16, size=usable)
            lefts.append(left)
            sub, _ = di16.interleave_field(left, right, LPF)
            crcs = pcm16x0.calc_crc(sub, xp=np)
            # ctrl bit 1 = SI at BIT_MODE_OFS (control_bit==false
            # means EI, pcm16x0datastitcher.cpp:1356-1365): a real SI
            # tape must not trip the --format pcm16x0 auto EI switch.
            bits = pcm16x0.line_bits(sub.reshape(LPF, 3, 3),
                                     crcs.reshape(LPF, 3), 1, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=7.0)
            img[half::2] = px
        vids.append(img)
    cap = tmp_path / "si.y4m"
    out = tmp_path / "si.wav"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "pcm16x0",
               "--quality", "fast"])
    assert rc == 0
    data, rate = wav.read_wav(out)
    el = np.asarray(pcm16x0.expand_sample(
        np.concatenate(lefts), xp=np)).astype(np.int64)
    o = data[:, 0].astype(np.int64)
    n_cmp = min(len(o), len(el))
    np.testing.assert_array_equal(o[:n_cmp], el[:n_cmp])
