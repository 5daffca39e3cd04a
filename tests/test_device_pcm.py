"""Chip-resident PCM-1 / PCM-16x0 driver == native driver, byte-identical
WAVs (pipeline/device_pcm.DevicePCMBatchDecoder: HBM-resident pixels,
one fused binarize dispatch + one packed readback per round, host
steady-frame replay)."""
import os

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import batch_driver, device_pcm

from test_batch_driver_formats import _pcm1_capture, _pcm16x0_capture


def _noisy(make, path, seed, noise):
    """Wrap a capture maker with additive gaussian noise."""
    from sdvpcmdecoder_tpu.pipeline import ingest
    import tempfile
    with tempfile.TemporaryDirectory() as t2:
        clean = os.path.join(t2, "clean.y4m")
        make(clean, n_frames=6, seed=seed)
        with ingest.open_capture(clean) as rd:
            frames = rd.read_frames(0, 6)
    rng = np.random.default_rng(seed + 1)
    frames = np.clip(frames.astype(np.int16)
                     + rng.normal(0, noise, frames.shape),
                     0, 255).astype(np.uint8)
    ingest.write_y4m(path, frames, chroma="mono")


def _run(cls, jobs, tmp, tag, fmt, **kw):
    dec = cls(jobs, shift_limit=1, frames_per_round=3, fmt=fmt, **kw) \
        if cls is batch_driver.BatchDecoder else \
        cls(jobs, fmt=fmt, shift_limit=1, frames_per_round=3, **kw)
    for k, j in enumerate(dec.jobs):
        j.out_path = os.path.join(tmp, f"{tag}_{k}.wav")
    dec.run()
    return [open(j.out_path, "rb").read() for j in dec.jobs], dec


@pytest.mark.parametrize("fmt,make,noise", [
    ("pcm1", _pcm1_capture, 0.0),
    ("pcm1", _pcm1_capture, 14.0),
    ("pcm16x0", _pcm16x0_capture, 0.0),
    ("pcm16x0", _pcm16x0_capture, 10.0),
])
def test_device_pcm_matches_native(tmp_path, fmt, make, noise):
    tmp = str(tmp_path)
    jobs = []
    for i in range(2):
        p = os.path.join(tmp, f"c{i}.y4m")
        if noise:
            _noisy(make, p, seed=40 + i, noise=noise)
        else:
            make(p, n_frames=6, seed=40 + i)
        jobs.append((p, os.path.join(tmp, f"o{i}.wav")))
    ref, rdec = _run(batch_driver.BatchDecoder, jobs, tmp, "ref", fmt,
                     backend="native")
    dev, ddec = _run(device_pcm.DevicePCMBatchDecoder, jobs, tmp,
                     "dev", fmt)
    for k, (a, b) in enumerate(zip(ref, dev)):
        assert a == b, f"WAV {k} differs (fmt={fmt} noise={noise})"
    s = list(ddec.jobs)[0].stats
    assert s.lines_valid > 0


def test_device_pcm_steady_frames_engage(tmp_path):
    """On a clean SI capture the native steady-frame path must consume
    (nearly) every frame of the device round's words."""
    from sdvpcmdecoder_tpu.ops import stitch_native as sn
    if not sn.available():
        pytest.skip("native core unavailable")
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
    tmp = str(tmp_path)
    p = os.path.join(tmp, "c.y4m")
    _pcm16x0_capture(p, n_frames=6, seed=7)
    hits = [0]
    orig = sp16.PCM16X0Stitcher._try_steady_frame

    def spy(self, buf):
        got = orig(self, buf)
        hits[0] += bool(got)
        return got

    sp16.PCM16X0Stitcher._try_steady_frame = spy
    try:
        _run(device_pcm.DevicePCMBatchDecoder,
             [(p, os.path.join(tmp, "o.wav"))], tmp, "dev", "pcm16x0")
    finally:
        sp16.PCM16X0Stitcher._try_steady_frame = orig
    assert hits[0] >= 5, hits


def test_device_pcm_chunked_staging_matches(tmp_path):
    """Captures longer than one HBM staging chunk decode byte-identical
    to native (chunk boundary crossing is invisible)."""
    tmp = str(tmp_path)
    p = os.path.join(tmp, "c.y4m")
    _pcm1_capture(p, n_frames=10, seed=5)
    jobs = [(p, os.path.join(tmp, "o.wav"))]
    ref, _ = _run(batch_driver.BatchDecoder, jobs, tmp, "ref", "pcm1",
                  backend="native")
    dec = device_pcm.DevicePCMBatchDecoder(
        jobs, fmt="pcm1", shift_limit=1, frames_per_round=3,
        hbm_frames=3)   # 10 frames -> 4 staging chunks
    for k, j in enumerate(dec.jobs):
        j.out_path = os.path.join(tmp, f"dev_{k}.wav")
    dec.run()
    assert dec.jobs[0].stage_next == 10
    dev = [open(j.out_path, "rb").read() for j in dec.jobs]
    assert ref[0] == dev[0]
