"""Thread-count bit-identity of the OpenMP-parallel native loops.

Every `omp parallel for` in stitchcore.cpp covers an outer loop whose
iterations write disjoint output rows with local state only — results
must be byte-identical for any OMP_NUM_THREADS.  The suite normally
runs with the ambient thread count; this test forces several counts in
subprocesses and compares outputs.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn

_WORKER = r"""
import os, pickle, sys
import numpy as np
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc

rng = np.random.default_rng(99)
F, LPF, W = 6, 294, 1152
n = 3 * F * 2 * LPF
frames = enc.encode_stream(
    rng.integers(1, 1 << 14, n), rng.integers(1, 1 << 14, n),
    width=W, ppb=8.0, n_lines=F * 2 * LPF, noise_sigma=12.0, rng=rng)
pixels, coords = frames[0], frames[1]
px = np.ascontiguousarray(pixels.reshape(F, 2 * LPF, W))
cd = np.ascontiguousarray(coords[::2 * LPF][:, None].repeat(2, 1)
                          if coords.ndim == 1 else coords[::2 * LPF],
                          np.int32)
ref = np.full(F, 110, np.int32)
blk = np.full(F, 20, np.int32)
wht = np.full(F, 200, np.int32)
out = sn.binarize_frames(px, cd, ref, blk, wht, 4, 2)
sys.stdout.buffer.write(pickle.dumps([np.asarray(o) for o in out]))
"""


@pytest.mark.skipif(not sn.available(), reason="no native core")
def test_binarize_identical_across_thread_counts(tmp_path):
    outs = {}
    for nt in ("1", "3"):
        env = dict(os.environ, OMP_NUM_THREADS=nt,
                   JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", _WORKER],
                           capture_output=True, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        outs[nt] = pickle.loads(r.stdout)
    for a, b in zip(outs["1"], outs["3"]):
        np.testing.assert_array_equal(a, b)
