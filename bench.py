#!/usr/bin/env python
"""Headline benchmark: STC-007 PAL end-to-end decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline = the reference's realtime watermark (~25 fps PAL on one x86 core;
renderpcm.h:76-80 pacing, BASELINE.md).

Two numbers are measured:
  * stc007_pal_e2e_frames_per_sec (the headline): 8 concurrent synthetic
    PAL captures through the FULL pipeline — Y4M ingest, V2D prescan +
    batched trial-grid binarize on the TPU, host stitcher (padding search,
    field order/res detection), P/Q ECC, audio masking, WAV out
    (pipeline/batch_driver.py, BASELINE config 5).
  * device_decode_frames_per_sec (extra): the device-only binarize +
    deinterleave chain (chained dispatches, one scalar readback), the
    round-1 metric.

The warm-up pass populates the persistent XLA compile cache, so repeat
runs (the driver re-runs this script every round) skip the multi-minute
trial-grid compile.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from sdvpcmdecoder_tpu.utils import jaxcache

BASELINE_FPS = 25.0  # reference realtime watermark (PAL), BASELINE.md
PAL_FIELD_LINES = 294  # config.h:80-81
PAL_LINES_PER_FRAME = 2 * PAL_FIELD_LINES
WIDTH = 1152


def device_only_fps():
    import jax
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.synth import encoder as enc
    from sdvpcmdecoder_tpu.pipeline import decoder

    frames_per_call = int(os.environ.get("BENCH_FRAMES", "128"))
    n_lines = frames_per_call * PAL_LINES_PER_FRAME
    rng = np.random.default_rng(0)
    n_samp = 3 * n_lines
    left = rng.integers(0, 1 << 14, size=n_samp)
    right = rng.integers(0, 1 << 14, size=n_samp)
    pixels, coords, *_ = enc.encode_stream(
        left, right, width=WIDTH, ppb=8.0, n_lines=n_lines,
        noise_sigma=10.0, rng=rng)

    px = jnp.asarray(pixels.reshape(frames_per_call, PAL_LINES_PER_FRAME,
                                    WIDTH))
    cd = jnp.asarray(coords[::PAL_LINES_PER_FRAME], jnp.int32)
    F = frames_per_call
    ref = jnp.full((F,), 110, jnp.int32)
    blk = jnp.full((F,), 20, jnp.int32)
    wht = jnp.full((F,), 200, jnp.int32)
    kw = dict(hyst_limit=4, shift_limit=2)  # NORMAL-mode-like limits

    def step(px_in, carry):
        # Chain the previous result into the input so every step truly
        # serializes on device (carry & 0 == 0, but XLA can't elide the
        # data dependency across dispatches).
        pxx = px_in ^ (carry & 0).astype(jnp.uint8)
        out = decoder.decode_frames(pxx, cd, ref, blk, wht, **kw)
        return (jnp.sum(out.samples.astype(jnp.int32))
                + jnp.sum(out.line_valid.astype(jnp.int32)))

    step_j = jax.jit(step)
    carry = jnp.int32(0)
    carry = step_j(px, carry)
    _ = float(carry)  # warm-up: compile + execute

    n_iter = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        carry = step_j(px, carry)
    total = float(carry)  # one readback drains the chained queue
    dt = time.perf_counter() - t0
    return frames_per_call * n_iter / dt


def device_smoke():
    """Seconds-fast sanity pass of the chip-resident driver (2 captures
    x 8 frames through DeviceBatchDecoder, WAV-identical to native) so
    a broken flagship surfaces as a traceback in `extra`, not as a
    silent null after a 30-minute bench.  Returns (ok, note)."""
    import traceback
    from sdvpcmdecoder_tpu.pipeline import batch_driver, device_driver
    try:
        with tempfile.TemporaryDirectory() as tmp:
            jobs = make_captures(tmp, 2, 8)

            def run(tag, cls, **kw):
                dec = cls(jobs, hyst_limit=4, shift_limit=2,
                          frames_per_round=4, **kw)
                for k, j in enumerate(dec.jobs):
                    j.out_path = os.path.join(tmp, f"{tag}{k}.wav")
                dec.run()
                return [open(j.out_path, "rb").read() for j in dec.jobs]

            dev = run("d", device_driver.DeviceBatchDecoder)
            nat = run("n", batch_driver.BatchDecoder, backend="native")
            if dev != nat:
                return False, "smoke WAVs differ from native"
            return True, None
    except Exception:
        return False, traceback.format_exc().strip().splitlines()[-1]


def _med_cv(vals):
    med = float(np.median(vals))
    cv = float(np.std(vals) / np.mean(vals)) if len(vals) > 1 else 0.0
    return round(med, 2), round(cv, 3)


def device_e2e_fps():
    """Chip-resident e2e: pixels staged in HBM once, the full decode
    (binarize + seam scoring + deinterleave/ECC + sample assembly) runs
    as one fused dispatch per round (pipeline/device_driver), samples
    and stats come back in KB/frame, host writes the WAV.  Returns
    (fps, staging_seconds, wav_identical_to_native)."""
    import tempfile
    from sdvpcmdecoder_tpu.pipeline import batch_driver, device_driver

    n_caps = int(os.environ.get("BENCH_E2E_CAPS", "8"))
    n_frames = int(os.environ.get("BENCH_DEV_FRAMES", "128"))
    with tempfile.TemporaryDirectory() as tmp:
        jobs = make_captures(tmp, n_caps, n_frames)

        def run(tag, cls, **kw):
            t0 = time.perf_counter()
            dec = cls(jobs, hyst_limit=4, shift_limit=2,
                      frames_per_round=64, **kw)
            stage_s = time.perf_counter() - t0
            for k, j in enumerate(dec.jobs):
                j.out_path = os.path.join(tmp, f"{tag}{k}.wav")
            t0 = time.perf_counter()
            dec.run()
            fps = n_caps * n_frames / (time.perf_counter() - t0)
            return fps, stage_s, [open(j.out_path, "rb").read()
                                  for j in dec.jobs]

        run("w", device_driver.DeviceBatchDecoder)  # compile warm-up
        best, stage_s, dev_wavs, fpss = 0.0, 0.0, None, []
        for t in "abc":
            fps, ss, wavs = run(t, device_driver.DeviceBatchDecoder)
            fpss.append(fps)
            if fps > best:
                best, stage_s, dev_wavs = fps, ss, wavs
        _, _, nat_wavs = run("n", batch_driver.BatchDecoder,
                             backend="native")
        ident = all(a == b for a, b in zip(dev_wavs, nat_wavs))
        med, cv = _med_cv(fpss)
        return dict(best=round(best, 2), median=med, cv=cv,
                    staging_seconds=round(stage_s, 3),
                    wav_identical=bool(ident))


def device_pcm_fps(fmt, make, n_caps=4, n_frames=48):
    """Chip-resident PCM-1/16x0 e2e (pipeline/device_pcm): fps median
    over 3 runs + WAV identity vs the native batch driver.  48 frames /
    16-frame rounds keep the tunnel RTT amortized (the steady rate this
    measures), not the per-capture warm-up."""
    from sdvpcmdecoder_tpu.pipeline import batch_driver, device_pcm
    with tempfile.TemporaryDirectory() as tmp:
        jobs = make(tmp, n_caps, n_frames)

        def run(tag, cls, **kw):
            # hyst_limit pinned for BOTH engines: the class defaults
            # differ (DevicePCMBatchDecoder 0 vs BatchDecoder 2), and a
            # mismatch would invalidate the WAV-identity check below.
            dec = cls(jobs, hyst_limit=2, shift_limit=1,
                      frames_per_round=16, fmt=fmt, **kw)
            for k, j in enumerate(dec.jobs):
                j.out_path = os.path.join(tmp, f"{fmt}{tag}{k}.wav")
            t0 = time.perf_counter()
            dec.run()
            fps = n_caps * n_frames / (time.perf_counter() - t0)
            return fps, [open(j.out_path, "rb").read()
                         for j in dec.jobs]

        run("w", device_pcm.DevicePCMBatchDecoder)   # warm-up
        fpss, wavs = [], None
        for t in "abc":
            fps, wavs = run(t, device_pcm.DevicePCMBatchDecoder)
            fpss.append(fps)
        _, nat = run("n", batch_driver.BatchDecoder, backend="native")
        med, cv = _med_cv(fpss)
        return dict(median=med, cv=cv,
                    wav_identical=bool(all(a == b
                                           for a, b in zip(wavs, nat))))


def make_captures(tmp, n_caps, n_frames):
    from sdvpcmdecoder_tpu.synth import encoder as enc
    from sdvpcmdecoder_tpu.pipeline import ingest
    jobs = []
    for c in range(n_caps):
        rng = np.random.default_rng(c)
        n = 3 * n_frames * 2 * PAL_FIELD_LINES
        frames = enc.encode_fields(rng.integers(1, 1 << 14, n),
                                   rng.integers(1, 1 << 14, n), n_frames,
                                   lines_pf=PAL_FIELD_LINES)
        vids = []
        for fr in frames:
            pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                         width=WIDTH, ppb=8.0)
        # interlace field-sequential lines back into frame rows
            L = pixels.shape[0]
            img = np.zeros((L, WIDTH), np.uint8)
            img[0::2] = pixels[:L // 2]
            img[1::2] = pixels[L // 2:]
            vids.append(img)
        p = os.path.join(tmp, f"cap{c}.y4m")
        ingest.write_y4m(p, np.stack(vids))
        jobs.append((p, os.path.join(tmp, f"cap{c}.wav")))
    return jobs


def e2e_fps(tmp):
    from sdvpcmdecoder_tpu.pipeline import batch_driver
    n_caps = int(os.environ.get("BENCH_E2E_CAPS", "8"))
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "32"))
    jobs = make_captures(tmp, n_caps, n_frames)
    stage = {}

    def run(tag, record=True):
        dec = batch_driver.BatchDecoder(jobs, hyst_limit=4, shift_limit=2,
                                        frames_per_round=16)
        for k, j in enumerate(dec.jobs):
            j.out_path = os.path.join(tmp, f"out_{tag}_{k}.wav")
        t0 = time.perf_counter()
        dec.run()
        fps = n_caps * n_frames / (time.perf_counter() - t0)
        # Only measured runs feed the stage table, so the reported
        # breakdown always belongs to the run behind the headline fps.
        if record and fps > stage.get("_fps", 0.0):
            stage.clear()
            stage.update({k: round(v, 4) for k, v in dec.stage_t.items()})
            stage["_fps"] = fps
            stage["_backend"] = dec.backend
        return fps

    run("warm", record=False)          # compile / cache warm-up
    # Median-of-5 is the recorded number (this 1-core host shows big
    # run-to-run noise; a best-of hides regressions); best + CV ride
    # along so round-over-round comparisons carry their error bars.
    fpss = [run(t) for t in "abcde"]
    med, cv = _med_cv(fpss)
    backend = stage.pop("_backend", "?")
    stage.pop("_fps", None)
    return dict(median=med, cv=cv, best=round(max(fpss), 2),
                backend=backend, stage=stage)


def make_pcm1_captures(tmp, n_caps, n_frames):
    from sdvpcmdecoder_tpu.formats import pcm1
    from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
    from sdvpcmdecoder_tpu.pipeline import ingest
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
    W = 1024
    jobs = []
    for c in range(n_caps):
        rng = np.random.default_rng(200 + c)
        vids = []
        for f in range(n_frames):
            img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
            for half in range(2):
                left = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
                right = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
                sl, sr = di1.interleave_field(left, right)
                words = np.zeros((sp1.LINES_PF, 6), np.int64)
                words[:, 0::2] = np.stack(
                    [sl[0::3], sl[1::3], sl[2::3]], 1)
                words[:, 1::2] = np.stack(
                    [sr[0::3], sr[1::3], sr[2::3]], 1)
                crcs = pcm1.calc_crc(words, xp=np)
                bits = pcm1.words_to_data_bits(words, crcs, xp=np)
                px, _ = enc_render(bits, W, 10.0)
                img[half::2] = px
            vids.append(img)
        p = os.path.join(tmp, f"p1_{c}.y4m")
        ingest.write_y4m(p, np.stack(vids), chroma="mono")
        jobs.append((p, os.path.join(tmp, f"p1_{c}.wav")))
    return jobs


def make_pcm16x0_captures(tmp, n_caps, n_frames):
    from sdvpcmdecoder_tpu.formats import pcm16x0
    from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
    from sdvpcmdecoder_tpu.pipeline import ingest
    from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
    W = 1600
    LPF = sp16.LINES_PF
    usable = (LPF * 3 // sp16.SI_TRUE_INTERLEAVE) \
        * sp16.SI_TRUE_INTERLEAVE
    jobs = []
    for c in range(n_caps):
        rng = np.random.default_rng(300 + c)
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
                px, _ = enc_render(bits, W, 7.0)
                img[half::2] = px
            vids.append(img)
        p = os.path.join(tmp, f"p16_{c}.y4m")
        ingest.write_y4m(p, np.stack(vids), chroma="mono")
        jobs.append((p, os.path.join(tmp, f"p16_{c}.wav")))
    return jobs


def enc_render(bits, width, ppb):
    from sdvpcmdecoder_tpu.synth import encoder as enc
    return enc.render_bits(np.asarray(bits), width=width, ppb=ppb)


def other_fmt_fps(tmp, fmt, make, n_caps=4, n_frames=24):
    # 24 frames/capture: the per-capture coordinate-search warm-up (2
    # searched frames before the agreement skip engages) stops dominating
    # the steady-state rate it is supposed to measure.
    from sdvpcmdecoder_tpu.pipeline import batch_driver
    jobs = make(tmp, n_caps, n_frames)

    def run(tag):
        dec = batch_driver.BatchDecoder(jobs, shift_limit=1,
                                        frames_per_round=8, fmt=fmt)
        for k, j in enumerate(dec.jobs):
            j.out_path = os.path.join(tmp, f"{fmt}_{tag}_{k}.wav")
        t0 = time.perf_counter()
        dec.run()
        return n_caps * n_frames / (time.perf_counter() - t0)

    run("warm")
    return max(run(t) for t in "abcde")


def device_fps_subprocess(probe_timeout=150, timeout=1800, env=None):
    """Run the device benches in a child process with a hard timeout: a
    wedged accelerator tunnel hangs `import jax` itself, which no
    in-process guard can interrupt.  A quick device-probe subprocess
    gates the full run (3 attempts with backoff — a tunnel that drops
    mid-session often comes back within minutes).  Returns
    (dict_or_None, note)."""
    import subprocess
    probed = False
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=probe_timeout,
                env=env)
            if r.returncode == 0:
                probed = True
                break
            note = "device probe failed: " + repr(
                (r.stderr or "").strip().splitlines()[-1:])
        except subprocess.TimeoutExpired:
            note = "device probe timed out (accelerator unreachable?)"
        time.sleep(30 * (attempt + 1))
    if not probed:
        return None, note
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-bench"],
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return None, "device bench timed out"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-1:]
        return None, f"device bench failed: {tail}"
    try:
        return json.loads(r.stdout.strip().splitlines()[-1]), None
    except (ValueError, IndexError):
        return None, "device bench produced no JSON"


def main():
    if "--device-only" in sys.argv:
        jaxcache.enable()
        print(device_only_fps())
        return
    if "--device-bench" in sys.argv:
        jaxcache.enable()
        smoke_ok, smoke_note = device_smoke()
        out = {"device_smoke_ok": bool(smoke_ok)}
        if smoke_note:
            out["device_smoke_note"] = smoke_note
        if smoke_ok:
            dev = device_only_fps()
            e2e = device_e2e_fps()
            out.update({
                "device_decode_frames_per_sec": round(dev, 2),
                "device_e2e_frames_per_sec": e2e["median"],
                "device_e2e_best_frames_per_sec": e2e["best"],
                "device_e2e_cv": e2e["cv"],
                "device_e2e_staging_seconds": e2e["staging_seconds"],
                "device_e2e_wav_identical": e2e["wav_identical"],
            })
            p1 = device_pcm_fps("pcm1", make_pcm1_captures)
            p16 = device_pcm_fps("pcm16x0", make_pcm16x0_captures)
            out.update({
                "device_pcm1_e2e_frames_per_sec": p1["median"],
                "device_pcm1_e2e_cv": p1["cv"],
                "device_pcm1_wav_identical": p1["wav_identical"],
                "device_pcm16x0_e2e_frames_per_sec": p16["median"],
                "device_pcm16x0_e2e_cv": p16["cv"],
                "device_pcm16x0_wav_identical": p16["wav_identical"],
            })
        print(json.dumps(out))
        return
    # The e2e paths run the host-native backend.  A wedged accelerator
    # tunnel hangs JAX initialization in-process even under
    # JAX_PLATFORMS=cpu while the PJRT plugin sits on the import path —
    # so the parent drops the plugin from its own paths and hands the
    # ORIGINAL environment to the device subprocess, which is the one
    # place the accelerator belongs.
    device_env = dict(os.environ)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    sys.path[:] = [p for p in sys.path if "axon" not in p]
    jaxcache.enable()
    dev_fps, dev_note = device_fps_subprocess(env=device_env)
    with tempfile.TemporaryDirectory() as tmp:
        host = e2e_fps(tmp)
        p1_fps = other_fmt_fps(tmp, "pcm1", make_pcm1_captures)
        p16_fps = other_fmt_fps(tmp, "pcm16x0", make_pcm16x0_captures)
    extra = {"pcm1_e2e_frames_per_sec": round(p1_fps, 2),
             "pcm16x0_e2e_frames_per_sec": round(p16_fps, 2),
             "host_e2e_frames_per_sec": host["median"],
             "host_e2e_best_frames_per_sec": host["best"],
             "host_e2e_cv": host["cv"],
             "host_backend": host["backend"],
             "stage_seconds": host["stage"],
             "e2e_scope": "y4m ingest + v2d prescan + trial-grid "
                          "binarize + host stitch + P/Q ECC + audio "
                          "mask + wav, 8 concurrent captures"}
    if dev_fps is not None:
        extra.update(dev_fps)
    else:
        extra["device_decode_frames_per_sec"] = None
        extra["device_e2e_frames_per_sec"] = None
        extra["device_bench_note"] = dev_note
    # Headline: the better full-pipeline e2e of the two engines — the
    # chip-resident driver when the accelerator is reachable and
    # WAV-identical, else the host-native streaming backend.  Both are
    # medians with CV recorded in extra.
    fps, backend = host["median"], host["backend"]
    dev_e2e = (dev_fps or {}).get("device_e2e_frames_per_sec")
    if dev_e2e and (dev_fps or {}).get("device_e2e_wav_identical") \
            and dev_e2e > fps:
        fps, backend = dev_e2e, "device"
    extra["backend"] = backend
    print(json.dumps({
        "metric": "stc007_pal_e2e_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
