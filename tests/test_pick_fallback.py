"""Bit Picker without the native core: _pick_edge_bits must populate
picked counts through the pure-Python twins (the false-positive prescan
consumes them), matching the native path bit for bit."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import v2d_other


def _edge_cut_line(rng, W=300):
    """A PCM-1 line whose coordinates place left-edge bits off frame."""
    words = [int(x) for x in rng.integers(0, 1 << 13, 6)]
    crc = int(pcm1.calc_crc(np.asarray([words]), xp=np)[0])
    ds, de = -8, W - 4
    lcut, rcut = ld.count_cut_bits(ld.SPEC_PCM1, ds, de, W, 4, 4)
    assert lcut > 0
    bad = list(words)
    bad[0] &= (1 << (13 - lcut)) - 1    # cut MSBs read as zeros
    return words, bad, crc, (ds, de), W


def _run_pick(drv, bad, crc, cds, W):
    wl = np.asarray([bad], np.int64).repeat(1, axis=0)
    cl = np.asarray([crc], np.int64)
    pl, pr = drv._pick_edge_bits(wl, cl, cds, W)
    return wl[0], int(cl[0]), int(pl[0]), int(pr[0])


@pytest.mark.skipif(not sn.available(), reason="needs both paths")
def test_python_fallback_matches_native(monkeypatch):
    rng = np.random.default_rng(3)
    drv = v2d_other.PCMFrameDriver("pcm1")
    for _ in range(8):
        words, bad, crc, cds, W = _edge_cut_line(rng)
        nat = _run_pick(drv, bad, crc, cds, W)
        monkeypatch.setattr(sn, "available", lambda: False)
        py = _run_pick(drv, bad, crc, cds, W)
        monkeypatch.undo()
        np.testing.assert_array_equal(nat[0], py[0])
        assert nat[1:] == py[1:]


def test_python_fallback_restores_cut_bits(monkeypatch):
    monkeypatch.setattr(sn, "available", lambda: False)
    rng = np.random.default_rng(4)
    drv = v2d_other.PCMFrameDriver("pcm1")
    restored = 0
    for _ in range(8):
        words, bad, crc, cds, W = _edge_cut_line(rng)
        got_w, got_c, pl, pr = _run_pick(drv, bad, crc, cds, W)
        if pl > 0:      # unique solution found
            np.testing.assert_array_equal(got_w, words)
            restored += 1
    assert restored >= 6    # collisions are rare
