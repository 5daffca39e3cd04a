#!/usr/bin/env python
"""Headline benchmark: STC-007 PAL decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's realtime watermark (~25 fps PAL on one x86 core;
renderpcm.h:76-80 pacing, BASELINE.md).

Pipeline measured: frame-grouped binarizer trial grid (hysteresis x pixel
shift, MXU bit-sampling matmul + CRC syndrome matmul) + deinterleave with
P/Q ECC. Throughput timing: N async dispatches chained to one final scalar
readback (the remote-TPU tunnel adds ~30 ms per readback, so per-call
blocking would measure the tunnel, not the chip).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 25.0  # reference realtime watermark (PAL), BASELINE.md
PAL_FIELD_LINES = 294  # config.h:80-81
PAL_LINES_PER_FRAME = 2 * PAL_FIELD_LINES
WIDTH = 1152


def main():
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
    # Warm up: compile + execute, verified by scalar readback.
    carry = jnp.int32(0)
    carry = step_j(px, carry)
    _ = float(carry)

    n_iter = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(n_iter):
        carry = step_j(px, carry)
    total = float(carry)  # one readback drains the chained queue
    dt = time.perf_counter() - t0

    fps = frames_per_call * n_iter / dt
    print(json.dumps({
        "metric": "stc007_pal_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
