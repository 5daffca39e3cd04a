"""Batch driver PCM-1 / PCM-16x0 jobs (BASELINE configs 3 and 4 through
the multi-capture path): WAV bytes equal the CLI single-capture decode.
"""
import numpy as np

from sdvpcmdecoder_tpu.__main__ import main
from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1, pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.synth import encoder as enc


def _pcm1_capture(path, n_frames=3, W=1024, seed=31):
    rng = np.random.default_rng(seed)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            left = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
            right = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
            sl, sr = di1.interleave_field(left, right)
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids), chroma="mono")


def _pcm16x0_capture(path, n_frames=3, W=1600, seed=32):
    rng = np.random.default_rng(seed)
    LPF = sp16.LINES_PF
    usable = (LPF * 3 // sp16.SI_TRUE_INTERLEAVE) \
        * sp16.SI_TRUE_INTERLEAVE
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * LPF, W), np.uint8)
        for half in range(2):
            left = rng.integers(1, 1 << 16, usable)
            right = rng.integers(1, 1 << 16, usable)
            sub, _ = di16.interleave_field(left, right, LPF)
            crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
            bits = pcm16x0.line_bits(sub.reshape(LPF, 3, 3),
                                     crcs.reshape(LPF, 3), 1, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=7.0)
            img[half::2] = px
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids), chroma="mono")


def _run_pair(tmp_path, fmt, make_capture, cli_fmt):
    cap = tmp_path / f"{fmt}.y4m"
    make_capture(cap)
    cli_out = tmp_path / "cli.wav"
    rc = main([str(cap), "-o", str(cli_out), "--format", cli_fmt,
               "--quality", "fast"])
    assert rc == 0
    bd_out = tmp_path / "bd.wav"
    dec = batch_driver.BatchDecoder([(str(cap), str(bd_out))],
                                    shift_limit=1, frames_per_round=2,
                                    fmt=fmt)
    stats = dec.run()
    s = list(stats.values())[0]
    assert s.lines_valid > 0
    assert cli_out.read_bytes() == bd_out.read_bytes()
    return dec


def test_batch_driver_pcm1(tmp_path):
    _run_pair(tmp_path, "pcm1", _pcm1_capture, "pcm1")


def test_batch_driver_pcm16x0(tmp_path):
    dec = _run_pair(tmp_path, "pcm16x0", _pcm16x0_capture, "pcm16x0")
    assert dec.jobs[0].stitcher.fmt == sp16.FORMAT_SI  # no bogus switch


def test_batch_driver_mixed_jobs_two_captures(tmp_path):
    """Two PCM-1 captures interleave round-robin and both WAVs match
    their solo decodes."""
    caps = []
    for k in range(2):
        cap = tmp_path / f"c{k}.y4m"
        _pcm1_capture(cap, seed=40 + k)
        caps.append(cap)
    solo = []
    for k, cap in enumerate(caps):
        out = tmp_path / f"solo{k}.wav"
        dec = batch_driver.BatchDecoder([(str(cap), str(out))],
                                        shift_limit=1, fmt="pcm1")
        dec.run()
        solo.append(out.read_bytes())
    outs = [tmp_path / f"m{k}.wav" for k in range(2)]
    dec = batch_driver.BatchDecoder(
        [(str(c), str(o)) for c, o in zip(caps, outs)],
        shift_limit=1, frames_per_round=1, fmt="pcm1")
    dec.run()
    for k in range(2):
        assert outs[k].read_bytes() == solo[k]
