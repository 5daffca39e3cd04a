"""NORMAL-mode reference-level sweep fidelity (STC-007).

The reference ALWAYS derives the STC-007 working reference level from a
full sweep with CRC-collision statistics at NORMAL/INSANE (processLine
binarizer.cpp:1121-1133); the center-of-black/white pick is a
DRAFT/FAST shortcut.  The failure mode that distinguishes them: a line
whose pixels read as a wrong-but-CRC-COLLIDING word set at the center
level, while most sweep levels read the true words — crafted here from
a GF(2) kernel vector of the CRC syndrome map (zeroing those bits
preserves CRC validity).

normal_sweep_prescan=True (the CLI's --quality normal) must decode the
TRUE words; the bare center-reference fast path demonstrably reads the
collision words on this capture.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import binarize as bz, stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import v2d


def _collision_line_bits(rng):
    """(true_bits [128], collision_bit_positions S): zeroing S keeps the
    CRC equation satisfied (S is in the syndrome map's kernel)."""
    table, _ = stc007.crc_syndrome_table()
    words = rng.integers(0, 1 << 14, (1, 8)).astype(np.int64)
    crc = np.asarray(stc007.calc_crc(words, xp=np))
    bits = np.asarray(stc007.words_to_data_bits(words, crc, xp=np))[0]
    ones = np.nonzero(bits)[0]
    A = (table[ones] & 1).astype(np.uint8)
    M = A.T.copy()                       # 16 x n, solve x A = 0
    n = M.shape[1]
    piv_cols, r = [], 0
    for c in range(n):
        if r >= 16:
            break
        hit = np.nonzero(M[r:, c])[0]
        if len(hit) == 0:
            continue
        pr = r + hit[0]
        M[[r, pr]] = M[[pr, r]]
        for rr in range(16):
            if rr != r and M[rr, c]:
                M[rr] ^= M[r]
        piv_cols.append(c)
        r += 1
    free = [c for c in range(n) if c not in piv_cols][0]
    x = np.zeros(n, np.uint8)
    x[free] = 1
    for i, c in enumerate(piv_cols):
        x[c] = int(M[i, free]) & 1
    S = ones[x.astype(bool)]
    b2 = bits.copy()
    b2[S] = 0
    w2, c2 = stc007.data_bits_to_words(b2[None], xp=np)
    assert int(np.asarray(stc007.calc_crc(w2, xp=np))[0]) \
        == int(np.asarray(c2)[0])        # the collision is real
    return bits, S, words[0]


def _render_collision_frame(n_lines=32, W=1152):
    """Frame of crafted lines: collision-kernel bits at gray 95 (read 0
    at the center level 110, read 1 below), a few true one-bits at gray
    125 so the collision span is NARROW — the sweep's statistics must
    prefer the wide true-word span, the center read falls in the
    collision span."""
    rng = np.random.default_rng(7)
    bits, S, true_words = _collision_line_bits(rng)
    full = np.concatenate([stc007.START_MARKER_BITS, bits,
                           stc007.STOP_MARKER_BITS])
    ppb = 8
    start_px = 32
    gray = np.where(full > 0, 200, 20).astype(np.float64)
    data_idx = 4 + np.arange(128)
    gray[data_idx[S]] = 95               # collision bits: mid-low gray
    breakers = data_idx[np.nonzero(bits)[0]]
    breakers = np.array([b for b in breakers
                         if b not in set(data_idx[S])])[:4]
    gray[breakers] = 125                 # cap the collision span
    line = np.full(W, 20, np.uint8)
    for i, g in enumerate(gray):
        line[start_px + i * ppb:start_px + (i + 1) * ppb] = int(g)
    frame = np.tile(line, (n_lines, 1))
    return frame, true_words, S, bits


@pytest.mark.skipif(not sn.available(), reason="native core unavailable")
def test_native_ref_sweep_lines_matches_xla():
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.synth import encoder as enc
    rng = np.random.default_rng(4)
    N, W = 16, 768
    n = 3 * N
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(0, 1 << 14, n), rng.integers(0, 1 << 14, n),
        width=W, ppb=5.0, n_lines=N, noise_sigma=18.0, rng=rng)
    cds = coords.astype(np.int32)
    bk = np.full(N, 20, np.int32)
    wt = np.full(N, 200, np.int32)
    levels = np.arange(254, 1, -4, dtype=np.int32)
    nat = sn.ref_sweep_lines(pixels, cds, bk, wt, levels, 4, 2)
    xla = bz.stc007_ref_sweep_decode(
        jnp.asarray(pixels[:, None, :]), jnp.asarray(cds),
        jnp.asarray(bk), jnp.asarray(wt), jnp.asarray(levels),
        hyst_limit=4, shift_limit=2)
    R = len(levels)
    assert np.array_equal(np.asarray(xla["valid"]).reshape(R, N),
                          nat["valid"])
    assert np.array_equal(np.asarray(xla["crc"]).reshape(R, N),
                          nat["crc"].astype(np.int32))
    assert np.array_equal(np.asarray(xla["hyst"]).reshape(R, N),
                          nat["hyst"].astype(np.int32))
    assert np.array_equal(np.asarray(xla["shift"]).reshape(R, N),
                          nat["shift"].astype(np.int32))
    assert np.array_equal(
        np.asarray(xla["words"]).reshape(R, N, 8),
        nat["words"].astype(np.int32))


def test_center_ref_reads_collision_but_sweep_reads_truth():
    frame, true_words, S, bits = _render_collision_frame()
    F = frame[None]
    base = v2d.V2DDriver(hyst_limit=2, shift_limit=1, dup_detect=False)
    res_c = base.decode_frames(F)[0]
    assert res_c is not None and res_c.valid.all()
    # The center-level read "validates" the WRONG (colliding) words —
    # the trap this test exists for.
    assert not np.array_equal(res_c.words[0], true_words)

    swept = v2d.V2DDriver(hyst_limit=2, shift_limit=1, dup_detect=False,
                          normal_sweep_prescan=True)
    res_s = swept.decode_frames(F)[0]
    assert res_s is not None and res_s.valid.all()
    np.testing.assert_array_equal(
        np.broadcast_to(true_words, res_s.words.shape), res_s.words)


def test_normal_sweep_noop_on_clean_capture():
    """On a clean capture the swept level decodes the same words as the
    center level (the option must not perturb good tapes)."""
    from sdvpcmdecoder_tpu.synth import encoder as enc
    rng = np.random.default_rng(11)
    L, W = 48, 1024
    n = 3 * L
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(0, 1 << 14, n), rng.integers(0, 1 << 14, n),
        width=W, ppb=7.0, n_lines=L, noise_sigma=8.0, rng=rng)
    F = pixels.reshape(1, L, W)
    a = v2d.V2DDriver(hyst_limit=2, shift_limit=1).decode_frames(F)[0]
    b = v2d.V2DDriver(hyst_limit=2, shift_limit=1,
                      normal_sweep_prescan=True).decode_frames(F)[0]
    assert np.array_equal(a.words, b.words)
    assert np.array_equal(a.valid, b.valid)
