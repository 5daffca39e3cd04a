"""Decode-quality regression guard: NORMAL-mode line recovery rates at
fixed Gaussian noise levels, pinned with margin below today's measured
rates (sigma 24 -> 128/128, 30 -> 125/128, 36 -> 107/128).  A refactor
that silently degrades the trial grid, AGC or marker fallback trips this
before it ships.  Also asserts the no-false-positive invariant: every
CRC-valid line is bit-exact at every noise level."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import v2d
from sdvpcmdecoder_tpu.synth import encoder as enc

N_LINES = 128


def _decode_at(sigma):
    n = 3 * N_LINES
    rngs = np.random.default_rng(12)
    px, cd, words, crcs = enc.encode_stream(
        rngs.integers(1, 1 << 14, n), rngs.integers(1, 1 << 14, n),
        width=1152, ppb=8.0, n_lines=N_LINES, noise_sigma=float(sigma),
        rng=np.random.default_rng(sigma))
    drv = v2d.V2DDriver(hyst_limit=4, shift_limit=2)
    res = drv.decode_frames(px[None])[0]
    return res, words


@pytest.mark.parametrize("sigma,min_valid", [(24, 128), (30, 115),
                                             (36, 90)])
def test_noise_recovery_rate(sigma, min_valid):
    res, words = _decode_at(sigma)
    assert res is not None
    nv = int(res.valid.sum())
    assert nv >= min_valid, f"sigma={sigma}: {nv}/{N_LINES}"
    # no false positives: CRC-valid lines decode bit-exact
    v = res.valid
    np.testing.assert_array_equal(res.words[v], words[v])
