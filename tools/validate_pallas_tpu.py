#!/usr/bin/env python
"""Validate the fused Pallas binarize kernel on REAL TPU hardware.

Checks bit-identity of ops.pallas_binarize.stc007_fused_decode_frames
against the XLA trial-grid path (ops.binarize.stc007_frame_decode) on
the device backend (NOT interpret mode), and measures the actual
speedup at NORMAL (hyst 4 / shift 2) and INSANE (hyst 10 / shift 4)
limits.  Writes tools/artifacts/pallas_tpu_validation.json.

The kernel's spec is the reference's readPCMdata sweep
(binarizer.cpp:7695): hysteresis depth x pixel-shift trials with
break-on-first-valid selection.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from sdvpcmdecoder_tpu.synth import encoder as enc
    from sdvpcmdecoder_tpu.ops import binarize as bz
    from sdvpcmdecoder_tpu.ops import pallas_binarize as pb
    from sdvpcmdecoder_tpu.utils import jaxcache
    jaxcache.enable()

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    out = {"backend": backend, "device": dev}
    if backend != "tpu":
        out["status"] = "SKIP: no TPU backend"
        print(json.dumps(out))
        return 1

    PAL = 294
    F = 64
    W = 1152
    n_lines = F * 2 * PAL
    rng = np.random.default_rng(7)
    n_samp = 3 * n_lines
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(0, 1 << 14, n_samp), rng.integers(0, 1 << 14, n_samp),
        width=W, ppb=8.0, n_lines=n_lines, noise_sigma=18.0, rng=rng)
    px = jnp.asarray(pixels.reshape(F, 2 * PAL, W))
    cd = jnp.asarray(coords[:: 2 * PAL], jnp.int32)
    ref = jnp.full((F,), 110, jnp.int32)
    blk = jnp.full((F,), 20, jnp.int32)
    wht = jnp.full((F,), 200, jnp.int32)

    results = {}
    for mode, (hl, sl) in (("normal", (4, 2)), ("insane", (10, 4))):
        xla = jax.jit(lambda p, c, r, b, w: bz.stc007_frame_decode(
            p, c, r, b, w, hyst_limit=hl, shift_limit=sl))
        pal = jax.jit(lambda p, c, r, b, w: pb.stc007_fused_decode_frames(
            p, c, r, b, w, hyst_limit=hl, shift_limit=sl))
        rx = xla(px, cd, ref, blk, wht)
        rp = pal(px, cd, ref, blk, wht)
        jax.block_until_ready((rx, rp))
        ident = dict(
            words=bool(jnp.array_equal(rx.words, rp.words)),
            crc_read=bool(jnp.array_equal(rx.crc_read, rp.crc_read)),
            valid=bool(jnp.array_equal(rx.valid, rp.valid)),
            hyst=bool(jnp.array_equal(rx.hyst, rp.hyst)),
            shift=bool(jnp.array_equal(rx.shift, rp.shift)),
        )
        valid_frac = float(jnp.mean(rx.valid.astype(jnp.float32)))

        def bench(fn, iters=10):
            fn(px, cd, ref, blk, wht).words.block_until_ready()
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = fn(px, cd, ref, blk, wht)
            o.words.block_until_ready()
            return F * iters / (time.perf_counter() - t0)

        fps_x = bench(xla)
        fps_p = bench(pal)
        results[mode] = dict(
            hyst_limit=hl, shift_limit=sl, bit_identical=ident,
            all_identical=all(ident.values()), valid_frac=valid_frac,
            xla_frames_per_sec=round(fps_x, 1),
            pallas_frames_per_sec=round(fps_p, 1),
            speedup=round(fps_p / fps_x, 2))
        print(f"{mode}: identical={all(ident.values())} "
              f"xla={fps_x:.0f} fps pallas={fps_p:.0f} fps "
              f"({fps_p / fps_x:.2f}x), valid={valid_frac:.3f}",
              file=sys.stderr)

    out["modes"] = results
    out["frames"] = F
    out["status"] = "OK" if all(r["all_identical"]
                                for r in results.values()) else "MISMATCH"
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "artifacts"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "pallas_tpu_validation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["status"] == "OK" else 2


if __name__ == "__main__":
    sys.exit(main())
