"""Bit-identity of the native coordinate search vs the Python reference.

stitchcore.cpp pcm_search_coordinates ports search_coordinates
(searchPCM1Data binarizer.cpp:4123 / searchPCM16X0Data :4514): the
left x right offset grid, the per-axis CRC-collision filter + region
pick, and the Bit Picker for edge-cut lines.  Randomized noisy lines
must produce identical picks.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _python_search(*args, **kw):
    """Run the pure-Python reference path (native disabled)."""
    import unittest.mock as mock
    with mock.patch.object(sn, "available", lambda: False):
        return ld.search_coordinates(*args, **kw)


def _pcm1_line(rng, W=900, margin=40, noise=20.0):
    words = rng.integers(0, 1 << 13, (1, 6)).astype(np.int64)
    crcs = pcm1.calc_crc(words, xp=np)
    bits = pcm1.words_to_data_bits(words, crcs, xp=np)
    px, (ds, de) = enc.render_bits(bits, width=W - 2 * margin, ppb=8.0)
    line = np.zeros(W, np.uint8)
    line[margin:W - margin] = px[0]
    line = np.clip(line.astype(np.float64)
                   + rng.normal(0, noise, W), 0, 255).astype(np.uint8)
    return line, (margin + ds, margin + de)


def _pcm16x0_line(rng, W=1500, margin=30, noise=15.0):
    sub = rng.integers(0, 1 << 16, (3, 3)).astype(np.int64)
    crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
    bits = np.asarray(pcm16x0.line_bits(sub, crcs, xp=np))[None]
    px, (ds, de) = enc.render_bits(bits, width=W - 2 * margin, ppb=7.0)
    line = np.zeros(W, np.uint8)
    line[margin:W - margin] = px[0]
    line = np.clip(line.astype(np.float64)
                   + rng.normal(0, noise, W), 0, 255).astype(np.uint8)
    return line, (margin + ds, margin + de)


def _same(a, b):
    if a is None or b is None:
        assert a is None and b is None
        return
    for k in ("crc", "hyst", "shift", "start", "stop", "picked"):
        assert a[k] == b[k], k
    assert list(a["words"]) == list(b["words"])


@pytest.mark.parametrize("seed", range(6))
def test_pcm1_search_identity(seed):
    rng = np.random.default_rng(seed)
    line, (ds, de) = _pcm1_line(rng, noise=float(rng.uniform(5, 40)))
    ref = int(rng.integers(90, 150))
    hist = (ds + int(rng.integers(-6, 7)), de + int(rng.integers(-6, 7)))
    nat = ld.search_coordinates(line, ref, 20, 220, len(line),
                                fmt="pcm1", history=hist)
    py = _python_search(line, ref, 20, 220, len(line), fmt="pcm1",
                        history=hist)
    _same(nat, py)
    if seed == 0:
        assert nat is not None   # the grid must actually resolve


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("part", [0, 1, 2])
def test_pcm16x0_search_identity(seed, part):
    rng = np.random.default_rng(100 + seed)
    line, (ds, de) = _pcm16x0_line(rng, noise=float(rng.uniform(5, 30)))
    ref = int(rng.integers(90, 150))
    hist = (ds + int(rng.integers(-4, 5)), de + int(rng.integers(-4, 5)))
    nat = ld.search_coordinates(line, ref, 20, 220, len(line),
                                fmt="pcm16x0", history=hist, part=part)
    py = _python_search(line, ref, 20, 220, len(line), fmt="pcm16x0",
                        history=hist, part=part)
    _same(nat, py)
    if seed == 0:
        assert nat is not None


def test_edge_cut_line_uses_bit_picker():
    """A line whose first bits are cut off the frame edge still resolves
    through the Bit Picker in both implementations."""
    rng = np.random.default_rng(9)
    words = rng.integers(0, 1 << 13, (1, 6)).astype(np.int64)
    crcs = pcm1.calc_crc(words, xp=np)
    bits = pcm1.words_to_data_bits(words, crcs, xp=np)
    W = 760
    px, (ds0, de0) = enc.render_bits(bits, width=W + 30, ppb=8.0)
    line = px[0][30:]                    # cut the left edge mid-word
    ref = 110
    hist = (ds0 - 30, de0 - 30)          # true coords in the cut frame
    nat = ld.search_coordinates(line, ref, 20, 220, W, fmt="pcm1",
                                history=hist)
    py = _python_search(line, ref, 20, 220, W, fmt="pcm1", history=hist)
    _same(nat, py)
