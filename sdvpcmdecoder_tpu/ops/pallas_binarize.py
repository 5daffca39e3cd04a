"""Fused Pallas kernel: STC-007 trial-grid binarize in one VMEM pass.

The XLA version (ops.binarize.stc007_frame_decode) materializes the
per-trial bit arrays [H, F, S, L, 128] in HBM between the sampling matmul,
the hysteresis scan and the syndrome matmul. This kernel fuses the whole
per-line pipeline for a tile of lines in VMEM:

  pixels tile [TL, W] --(bf16 one-hot matmul, MXU)--> samples [S, TL, 128]
     --(Schmitt prefix scan, VPU)--> bits per (hyst, shift) trial
     --(syndrome matmul vs CRC table, MXU)--> valid flags
     --(lexicographic first-valid select)--> words [TL, 9] + flags

Bit packing is also a matmul (powers-of-two weights; sums < 2^16 so f32
exact). Selection mirrors readPCMdata's break-on-first-valid order.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    # Tests run on CPU where Mosaic can't compile; use interpreter there.
    return jax.default_backend() != "tpu"

from ..formats import stc007
from . import binarize as bz

NBITS = stc007.BITS_PCM_DATA  # 128


@functools.lru_cache(maxsize=None)
def _pack_weights():
    """[128, 16] weight matrix packing chosen bits into 9 words.

    Columns 0..7 are the eight 14-bit words, column 8..? CRC needs 16 bits
    -> use [128, 9] with per-column weights; laid out padded to 16 columns
    for tiling friendliness.
    """
    wmat = np.zeros((NBITS, 16), dtype=np.float32)
    pos = 0
    for w in range(8):
        for b in range(14):
            wmat[pos, w] = float(1 << (13 - b))
            pos += 1
    for b in range(16):
        wmat[pos, 8] = float(1 << (15 - b))
        pos += 1
    return wmat


@functools.lru_cache(maxsize=None)
def _synd_table():
    table, const = stc007.crc_syndrome_table()
    return table.astype(np.float32), const


def _schmitt_scan(a, b):
    """Inclusive prefix composition of 2-state maps over the last axis.

    a = out-if-prev0, b = out-if-prev1 as int32 0/1 (Mosaic lowers int
    selects more reliably than i1 vectors). Hillis-Steele with static
    shifts; identity element = (0, 1) == identity map.
    """
    n = a.shape[-1]
    ii = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    d = 1
    while d < n:
        # Left-shifted-by-d predecessors with identity padding.
        pa = jnp.concatenate(
            [jnp.zeros_like(a[..., :d]), a[..., :n - d]], axis=-1)
        pb = jnp.concatenate(
            [jnp.ones_like(b[..., :d]), b[..., :n - d]], axis=-1)
        pa = jnp.where(ii < d, 0, pa)
        pb = jnp.where(ii < d, 1, pb)
        # combine(l, r): x -> r(l(x)); element i's l is i-d's prefix.
        na = pa * b + (1 - pa) * a
        nb = pb * b + (1 - pb) * a
        a, b = na, nb
        d *= 2
    return a  # initial state prev=0


def _kernel_values(px, sel, refl, black, white, wpack, synd_t,
                   *, n_h, n_s, synd_const):
    """Value-form kernel core; returns (words16, valid, hyst, shift)."""
    TL = px.shape[0]
    # Mosaic can't cast u8 -> bf16 directly; hop through int32.
    pxt = px.astype(jnp.int32).astype(jnp.bfloat16)  # [TL, W]
    refl = refl.astype(jnp.int32)                    # [TL, 1]
    black = black.astype(jnp.int32)
    white = white.astype(jnp.int32)

    chosen_bits = jnp.zeros((TL, NBITS), dtype=jnp.float32)
    chosen = jnp.zeros((TL, 1), dtype=jnp.int32)
    out_h = jnp.zeros((TL, 1), dtype=jnp.int32)
    out_s = jnp.zeros((TL, 1), dtype=jnp.int32)

    samples = []
    for s in range(n_s):
        sel_s = sel[s]                            # [128, W] bf16
        smp = jax.lax.dot_general(
            pxt, sel_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [TL, 128]
        samples.append(smp.astype(jnp.int32))

    for h in range(n_h):
        rl = jnp.maximum(refl - h, 1)             # [TL, 1]
        rh = jnp.minimum(refl + h, 254)
        ok_ref = ((rl > black) & (rh < white)).astype(jnp.int32)
        for s in range(n_s):
            smp = samples[s]
            a = (smp > rl).astype(jnp.int32)
            b = (smp >= rh).astype(jnp.int32)
            bits = _schmitt_scan(a, b).astype(jnp.float32)  # [TL, 128]
            synd_bits = jax.lax.dot_general(
                bits, synd_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sb = synd_bits.astype(jnp.int32) & 1
            weights = jax.lax.broadcasted_iota(jnp.int32, (TL, 16), 1)
            packed = jnp.sum(sb << weights, axis=-1, keepdims=True)
            valid = (packed == synd_const).astype(jnp.int32) * ok_ref
            take = valid * (1 - chosen)                    # [TL, 1]
            takef = take.astype(jnp.float32)
            chosen_bits = takef * bits + (1.0 - takef) * chosen_bits
            out_h = take * h + (1 - take) * out_h
            out_s = take * s + (1 - take) * out_s
            chosen = jnp.maximum(chosen, valid)
            if h == 0 and s == 0:
                fallback = bits
    # Fallback to trial (0, 0) when nothing validated.
    chf = chosen.astype(jnp.float32)
    chosen_bits = chf * chosen_bits + (1.0 - chf) * fallback
    words = jax.lax.dot_general(
        chosen_bits, wpack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [TL, 16]
    return words.astype(jnp.int32), chosen, out_h, out_s


def _kernel(px_ref, sel_ref, ref_ref, black_ref, white_ref, wpack_ref,
            synd_ref, words_ref, valid_ref, hyst_ref, shift_ref,
            *, n_h, n_s, synd_const):
    w, v, hh, ss = _kernel_values(
        px_ref[:], sel_ref[:], ref_ref[:], black_ref[:], white_ref[:],
        wpack_ref[:], synd_ref[:], n_h=n_h, n_s=n_s, synd_const=synd_const)
    words_ref[:] = w
    valid_ref[:] = v
    hyst_ref[:] = hh
    shift_ref[:] = ss


def build_selection(coords, n_s, width):
    """Per-frame one-hot sampling matrices [F, S, 128, W] bf16."""
    start = coords[:, 0].astype(jnp.int32)
    stop = coords[:, 1].astype(jnp.int32)
    psm, half = bz.calc_ppb(start, stop, stc007.BITS_BETWEEN_COORDS)
    pc = bz.bit_pixel_coords(
        start[:, None], psm[:, None], half[:, None],
        jnp.arange(n_s, dtype=jnp.int32)[None, :], NBITS,
        stc007.COORD_BIT_OFS, stc007.BITS_IN_LINE, stc007.BITS_LEFT_SHIFT,
        stc007.BITS_RIGHT_SHIFT, pixel_stop=width)      # [F, S, 128]
    iota = jnp.arange(width, dtype=jnp.int32)
    return (pc[..., None] == iota).astype(jnp.bfloat16)


def _auto_tile(n_h, n_s, tile_lines):
    """Shrink the line tile when the trial grid is deep: the unrolled
    (hyst x shift) trial loop's live [TL, 128] intermediates scale the
    Mosaic VMEM stack linearly with TL x trials (INSANE limits OOM the
    16 MB scoped-vmem budget at TL=296 on v5e; measured r4)."""
    trials = n_h * n_s
    if trials <= 24:
        return tile_lines
    return min(tile_lines, 128 if trials <= 60 else 64)


def stc007_fused_decode_frames(pixels, coords, ref_level, black, white,
                               hyst_limit=4, shift_limit=2,
                               tile_lines=296):
    """Per-frame fused decode: pixels [F, Lf, W], coords [F, 2],
    ref/black/white [F]. Grid is (frame, line-tile); each frame's
    selection matrix streams from HBM once per tile. Returns a LineBatch
    with leading shape [F, Lf] (mirrors bz.stc007_frame_decode)."""
    F, Lf, W = pixels.shape
    n_h, n_s = hyst_limit + 1, shift_limit + 1
    tile_lines = _auto_tile(n_h, n_s, tile_lines)
    sel = build_selection(jnp.asarray(coords), n_s, W)     # [F,S,128,W]
    pad = (-Lf) % tile_lines
    if pad:
        pixels = jnp.concatenate(
            [pixels, jnp.zeros((F, pad, W), pixels.dtype)], axis=1)
    Lp = pixels.shape[1]
    table, const = _synd_table()
    kern = functools.partial(_kernel, n_h=n_h, n_s=n_s, synd_const=const)
    rl = jnp.broadcast_to(ref_level[:, None, None], (F, Lp, 1))
    bl = jnp.broadcast_to(black[:, None, None], (F, Lp, 1))
    wl = jnp.broadcast_to(white[:, None, None], (F, Lp, 1))
    grid = (F, Lp // tile_lines)

    def k3(px_ref, sel_ref, ref_ref, black_ref, white_ref, wpack_ref,
           synd_ref, words_ref, valid_ref, hyst_ref, shift_ref):
        w, v, hh, ss = _kernel_values(
            px_ref[0], sel_ref[0], ref_ref[0], black_ref[0], white_ref[0],
            wpack_ref[:], synd_ref[:], n_h=n_h, n_s=n_s, synd_const=const)
        words_ref[0] = w
        valid_ref[0] = v
        hyst_ref[0] = hh
        shift_ref[0] = ss

    words16, valid, hyst, shift = pl.pallas_call(
        k3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_lines, W), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_s, NBITS, W), lambda f, i: (f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBITS, 16), lambda f, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBITS, 16), lambda f, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_lines, 16), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lines, 1), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, Lp, 16), jnp.int32),
            jax.ShapeDtypeStruct((F, Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((F, Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((F, Lp, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(pixels, sel, rl, bl, wl, jnp.asarray(_pack_weights()),
      jnp.asarray(table))
    words = words16[:, :Lf, :8]
    crc_read = words16[:, :Lf, 8]
    valid = valid[:, :Lf, 0].astype(bool)
    crc_calc = stc007.calc_crc(words)
    return bz.LineBatch(words=words, crc_read=crc_read, crc_calc=crc_calc,
                        valid=valid, hyst=hyst[:, :Lf, 0],
                        shift=shift[:, :Lf, 0])


def stc007_fused_decode(pixels, coords, ref_level, black, white,
                        hyst_limit=4, shift_limit=2, tile_lines=296):
    """Fused decode for one frame group sharing coordinates.

    pixels [L, W] uint8, coords (start, stop) python ints/0-d arrays,
    ref/black/white [L] int32. Returns a binarize.LineBatch.
    """
    L, W = pixels.shape
    n_h, n_s = hyst_limit + 1, shift_limit + 1
    tile_lines = _auto_tile(n_h, n_s, tile_lines)
    # Selection matrices (host-precomputed per frame geometry).
    start = jnp.asarray([int(coords[0])], jnp.int32)
    psm, half = bz.calc_ppb(start, jnp.asarray([int(coords[1])], jnp.int32),
                            stc007.BITS_BETWEEN_COORDS)
    pc = bz.bit_pixel_coords(
        start[:, None], psm[:, None], half[:, None],
        jnp.arange(n_s, dtype=jnp.int32)[None, :], NBITS,
        stc007.COORD_BIT_OFS, stc007.BITS_IN_LINE, stc007.BITS_LEFT_SHIFT,
        stc007.BITS_RIGHT_SHIFT, pixel_stop=W)[0]          # [S, 128]
    iota = jnp.arange(W, dtype=jnp.int32)
    sel = (pc[..., None] == iota).astype(jnp.bfloat16)      # [S, 128, W]

    pad = (-L) % tile_lines
    if pad:
        pixels = jnp.concatenate(
            [pixels, jnp.zeros((pad, W), pixels.dtype)])
        ref_level = jnp.concatenate([ref_level,
                                     jnp.ones(pad, ref_level.dtype)])
        black = jnp.concatenate([black, jnp.zeros(pad, black.dtype)])
        white = jnp.concatenate([white, jnp.full(pad, 255, white.dtype)])
    Lp = pixels.shape[0]
    table, const = _synd_table()
    grid = (Lp // tile_lines,)
    kern = functools.partial(_kernel, n_h=n_h, n_s=n_s, synd_const=const)
    words16, valid, hyst, shift = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_lines, W), lambda i: (i, 0),
                         memory_space=pltpu.ANY
                         if False else pltpu.VMEM),
            pl.BlockSpec((n_s, NBITS, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBITS, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBITS, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_lines, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lines, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, 16), jnp.int32),
            jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Lp, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(pixels, sel, ref_level[:, None], black[:, None], white[:, None],
      jnp.asarray(_pack_weights()), jnp.asarray(table))
    words = words16[:L, :8]
    crc_read = words16[:L, 8]
    valid = valid[:L, 0].astype(bool)
    crc_calc = stc007.calc_crc(words)
    return bz.LineBatch(words=words, crc_read=crc_read, crc_calc=crc_calc,
                        valid=valid, hyst=hyst[:L, 0], shift=shift[:L, 0])
