"""Multi-chip sharded decode equals the single-device decode bit-for-bit
(8 virtual CPU devices via conftest)."""
import numpy as np
import jax
import jax.numpy as jnp

from sdvpcmdecoder_tpu.parallel import mesh as pm
from sdvpcmdecoder_tpu.pipeline import decoder
from sdvpcmdecoder_tpu.synth import encoder as enc


def test_sharded_decode_matches_single_device():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(42)
    n_lines = 4 * pm.HALO + 112  # 4 chunks x 112 + halo tail
    n = 3 * n_lines
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    pixels, coords, words, crcs = enc.encode_stream(
        left, right, width=1152, ppb=8.0, n_lines=n_lines)

    # Single-device reference result.
    ref_r = decoder.decode_stream(
        jnp.asarray(pixels), jnp.asarray(coords, jnp.int32),
        jnp.full(n_lines, 110, jnp.int32), jnp.full(n_lines, 20, jnp.int32),
        jnp.full(n_lines, 200, jnp.int32), hyst_limit=1, shift_limit=1)
    ref_samples = np.asarray(ref_r.samples)
    ref_valid = int(np.asarray(ref_r.line_valid).sum())

    # 2 captures x 4 seq chunks over an 8-device mesh.
    m = pm.decode_mesh(8, seq=4)
    chunks, chunk = pm.chunk_lines_with_halo(pixels, 4)
    cd_chunks, _ = pm.chunk_lines_with_halo(coords, 4)
    D, S = 2, 4
    px = np.broadcast_to(chunks[None], (D,) + chunks.shape).copy()
    cd = np.broadcast_to(cd_chunks[None], (D,) + cd_chunks.shape).copy()
    Lc = chunks.shape[1]
    ref_l = np.full((D, S, Lc), 110, np.int32)
    blk = np.full((D, S, Lc), 20, np.int32)
    wht = np.full((D, S, Lc), 200, np.int32)
    step = pm.multichip_decode_step(m, hyst_limit=1, shift_limit=1)
    gathered, n_valid = step(
        pm.shard_captures(px, m), pm.shard_captures(cd, m),
        pm.shard_captures(ref_l, m), pm.shard_captures(blk, m),
        pm.shard_captures(wht, m))
    gathered = np.asarray(gathered)      # [D, S, S, blocks_c, 6]
    # psum over both axes counts every device's valid lines: 2 captures
    # x 4 chunks, each chunk decodes `chunk`+halo lines.
    total = int(np.asarray(n_valid)[0, 0])
    assert total > 0

    # Reassemble capture 0 from its gathered chunks: chunk k contributes
    # blocks [0, chunk) of its local decode (the halo covers the rest).
    samples_c = np.asarray(gathered)[0, 0]   # [S, 3*blocks_c, 2]
    per_chunk = []
    for k in range(S):
        per_chunk.append(samples_c[k, :3 * chunk])
    stitched = np.concatenate(per_chunk, axis=0)
    n_cmp = min(len(stitched), len(ref_samples))
    np.testing.assert_array_equal(stitched[:n_cmp], ref_samples[:n_cmp])
