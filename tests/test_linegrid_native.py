"""Native linegrid_coord_sweep vs the serial Python read_pcm_grid sweep.

The C++ sweep (native/stitchcore.cpp linegrid_coord_sweep) must be
bit-identical to refine_failed_lines' Python fallback, including the
readPCMdata fallback-trial semantics (binarizer.cpp:3190): the (0,0)
trial after the hysteresis grid can only newly succeed when the grid
was clipped at depth 0 (ref outside (black, white)).
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _python_sweep(px, ds, de, ref, black, white, fmt, part, deltas, shl):
    for d1 in deltas:
        for d2 in deltas:
            if fmt == "pcm1":
                w, cr, calc, ok, d, s = ld.read_pcm_grid(
                    ld.decode_trial_pcm1, px, ds + d1, de + d2,
                    ref, black, white, len(px), 0, shl)
            else:
                w, cr, calc, ok, d, s = ld.read_pcm_grid(
                    ld.decode_trial_pcm16x0, px, ds + d1, de + d2,
                    ref, black, white, len(px), 0, shl, part=part)
            if ok:
                return [int(x) for x in w] + [int(cr)], (d1, d2, d, s)
    return None


def _render(rng, fmt):
    W = 1024
    if fmt == "pcm1":
        w = rng.integers(0, 1 << 13, size=(1, 6))
        crc = np.asarray(pcm1.calc_crc(w, xp=np))
        bits = pcm1.words_to_data_bits(w, crc, xp=np)
        part = 0
    else:
        sub = rng.integers(0, 1 << 16, size=(3, 3))
        crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
        bits = np.asarray(pcm16x0.line_bits(sub, crcs, xp=np)).reshape(1, -1)
        part = int(rng.integers(0, 3))
    px, (ds, de) = enc.render_bits(
        bits, width=W, ppb=float(rng.choice([5.0, 8.0])),
        noise_sigma=6.0, rng=rng)
    return px[0], ds, de, part


@pytest.mark.parametrize("seed", range(6))
def test_sweep_equivalence(seed):
    rng = np.random.default_rng(seed)
    deltas = sorted(range(-8, 9, 2), key=abs)
    for trial in range(10):
        fmt = "pcm1" if (trial + seed) % 2 == 0 else "pcm16x0"
        px, ds, de, part = _render(rng, fmt)
        jitter = int(rng.integers(-6, 7))
        got_py = _python_sweep(px, ds + jitter, de, 110, 20, 200,
                               fmt, part, deltas, 2)
        got_nat = sn.linegrid_coord_sweep(px, ds + jitter, de, 110, 20, 200,
                                          fmt, part, deltas, deltas, 0, 2)
        if got_py is None:
            assert got_nat is None
        else:
            assert got_nat is not None
            assert list(map(int, got_nat[0])) == got_py[0]
            assert got_nat[1] == got_py[1]


def test_sweep_fallback_clipped_ref():
    # ref outside (black, white): the grid is skipped at depth 0 and the
    # fallback (0, 0) trial is the only candidate, matching read_pcm_grid.
    rng = np.random.default_rng(7)
    for fmt in ("pcm1", "pcm16x0"):
        px, ds, de, part = _render(rng, fmt)
        deltas = sorted(range(-4, 5, 2), key=abs)
        for ref, black, white in ((10, 20, 200), (250, 20, 200)):
            got_py = _python_sweep(px, ds, de, ref, black, white,
                                   fmt, part, deltas, 2)
            got_nat = sn.linegrid_coord_sweep(px, ds, de, ref, black, white,
                                              fmt, part, deltas, deltas, 0, 2)
            if got_py is None:
                assert got_nat is None
            else:
                assert list(map(int, got_nat[0])) == got_py[0]
                assert got_nat[1] == got_py[1]


def test_refine_failed_lines_dispatch_matches_numpy(monkeypatch):
    # refine_failed_lines must give identical dicts with and without the
    # native core.
    rng = np.random.default_rng(11)
    for fmt in ("pcm1", "pcm16x0"):
        lines, valids = [], []
        ds = de = None
        for i in range(5):
            px, s0, e0, _ = _render(rng, fmt)
            if ds is None:
                ds, de = s0, e0
            if i % 2 == 0:
                px = np.roll(px, int(rng.integers(-4, 5)))
            lines.append(px)
            valids.append(False)
        lines = np.stack(lines)
        valid = (np.zeros(len(lines), bool) if fmt == "pcm1"
                 else np.zeros((len(lines), 3), bool))
        got_nat = ld.refine_failed_lines(lines, valid, (ds, de),
                                         110, 20, 200, fmt)
        monkeypatch.setattr(sn, "_LIB", None)
        monkeypatch.setattr(sn, "_TRIED", True)
        got_py = ld.refine_failed_lines(lines, valid, (ds, de),
                                        110, 20, 200, fmt)
        monkeypatch.undo()
        assert got_nat == got_py
