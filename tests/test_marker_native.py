"""Native marker search == the Python reference walk, bit for bit."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import markers
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.synth import encoder as enc

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _numpy_markers(pixels, ref, **kw):
    import sdvpcmdecoder_tpu.ops.stitch_native as mod
    saved = mod._LIB, mod._TRIED
    mod._LIB, mod._TRIED = None, True
    try:
        return markers.search_markers(pixels, ref, **kw)
    finally:
        mod._LIB, mod._TRIED = saved


def _assert_same(a, b):
    for f in ("start_found", "stop_found", "data_start", "data_stop",
              "start_bg", "start_ed", "stop_ed"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)


def test_native_markers_on_synthetic_lines():
    rng = np.random.default_rng(0)
    n_lines = 80
    n = 3 * n_lines
    pixels, coords, *_ = enc.encode_stream(
        rng.integers(1, 1 << 14, n), rng.integers(1, 1 << 14, n),
        width=1152, ppb=8.0, n_lines=n_lines, noise_sigma=10.0, rng=rng)
    ref = np.full(n_lines, 110)
    nat = markers.search_markers(pixels, ref)
    py = _numpy_markers(pixels, ref)
    _assert_same(nat, py)
    assert nat.start_found.all() and nat.stop_found.all()


def test_native_markers_on_noise_and_edges():
    rng = np.random.default_rng(1)
    for W in (64, 520, 1152):
        px = rng.integers(0, 256, size=(40, W)).astype(np.uint8)
        # some flat lines, some saturated
        px[0] = 0
        px[1] = 255
        px[2, : W // 2] = 255
        ref = rng.integers(2, 254, size=40)
        for hyst in (0, 3):
            nat = markers.search_markers(px, ref, hyst_lvl=hyst)
            py = _numpy_markers(px, ref, hyst_lvl=hyst)
            _assert_same(nat, py)
