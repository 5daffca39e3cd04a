"""Captures-sharded-over-chips full-pipeline decode (VERDICT r3 item 5).

ShardedBatchDecoder runs the REAL batch driver per device shard (device
binarize + host stitch + ECC + audio + WAV) and psums the stats over
the mesh.  The 8-way sharded WAVs must be byte-identical to a 1-way
run — the decode is deterministic, so any divergence is a sharding bug.
Runs on the suite's 8 virtual CPU devices (conftest).
"""
import os

import numpy as np
import pytest
import jax

from sdvpcmdecoder_tpu.parallel.multichip import ShardedBatchDecoder
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest
from sdvpcmdecoder_tpu.synth import encoder as enc

LPF = 294
W = 1152


def _captures(tmp, n_caps, n_frames=4):
    jobs = []
    for c in range(n_caps):
        rng = np.random.default_rng(40 + c)
        n = 3 * n_frames * 2 * LPF
        frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                                   rng.integers(1, 1 << 14, n),
                                   n_frames, lines_pf=LPF)
        vids = []
        for fr in frames:
            px, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=W, ppb=8.0)
            L = px.shape[0]
            img = np.zeros((L, W), np.uint8)
            img[0::2] = px[:L // 2]
            img[1::2] = px[L // 2:]
            vids.append(img)
        p = os.path.join(tmp, f"mc{c}.y4m")
        ingest.write_y4m(p, np.stack(vids))
        jobs.append((p, os.path.join(tmp, f"mc{c}.wav")))
    return jobs


def test_sharded_wavs_match_single_device(tmp_path):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    tmp = str(tmp_path)
    jobs = _captures(tmp, n_caps=4)
    kw = dict(hyst_limit=1, shift_limit=1, frames_per_round=2)

    sharded = ShardedBatchDecoder(
        [(p, o) for p, o in jobs], devices=devs, **kw)
    sharded.run()
    wav_sharded = [open(o, "rb").read() for _, o in jobs]
    assert sharded.stats is not None and sharded.stats[0] > 0
    # psum total == host-side sum of the per-shard counters
    np.testing.assert_array_equal(sharded.stats,
                                  sharded.shard_stats.sum(axis=0))

    single_jobs = [(p, o + ".one") for p, o in jobs]
    dec = batch_driver.BatchDecoder(single_jobs, backend="tpu", **kw)
    dec.run()
    wav_single = [open(o, "rb").read() for _, o in single_jobs]
    assert all(len(w) > 44 for w in wav_single)
    assert wav_sharded == wav_single


def test_sharded_device_resident_wavs_match(tmp_path):
    """device_resident=True shards the CHIP-RESIDENT DeviceBatchDecoder
    (VERDICT r4 item 9): 8-way sharded chip-resident WAVs must be
    byte-identical to the native single run."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    tmp = str(tmp_path)
    jobs = _captures(tmp, n_caps=4, n_frames=5)
    kw = dict(hyst_limit=1, shift_limit=1, frames_per_round=3)

    sharded = ShardedBatchDecoder(
        [(p, o) for p, o in jobs], devices=devs, device_resident=True,
        **kw)
    sharded.run()
    wav_sharded = [open(o, "rb").read() for _, o in jobs]
    assert sharded.stats is not None and sharded.stats[0] > 0

    single_jobs = [(p, o + ".one") for p, o in jobs]
    dec = batch_driver.BatchDecoder(single_jobs, backend="native", **kw)
    dec.run()
    wav_single = [open(o, "rb").read() for _, o in single_jobs]
    assert all(len(w) > 44 for w in wav_single)
    assert wav_sharded == wav_single


def test_sharded_device_resident_pcm(tmp_path):
    """device_resident sharding covers the PCM chip drivers too."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    from test_batch_driver_formats import _pcm1_capture
    tmp = str(tmp_path)
    jobs = []
    for c in range(2):
        p = os.path.join(tmp, f"p{c}.y4m")
        _pcm1_capture(p, n_frames=4, seed=60 + c)
        jobs.append((p, os.path.join(tmp, f"p{c}.wav")))
    kw = dict(shift_limit=1, frames_per_round=2)
    sharded = ShardedBatchDecoder(jobs, devices=devs, fmt="pcm1",
                                  device_resident=True, **kw)
    sharded.run()
    wav_sharded = [open(o, "rb").read() for _, o in jobs]
    single_jobs = [(p, o + ".one") for p, o in jobs]
    batch_driver.BatchDecoder(single_jobs, fmt="pcm1",
                              backend="native", **kw).run()
    wav_single = [open(o, "rb").read() for _, o in single_jobs]
    assert wav_sharded == wav_single
