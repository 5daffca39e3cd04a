"""Native field-split scan (stc007_split_scan) == numpy twin."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _cmp_store(a, b):
    for f in st.LineStore.FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))


def test_split_scan_differential(monkeypatch):
    rng = np.random.default_rng(7)
    s = st.STC007Stitcher()
    for trial in range(120):
        n = int(rng.integers(1, 700))
        buf = st.LineStore(n)
        buf.words[:] = rng.integers(0, 1 << 14, (n, 8))
        if rng.random() < 0.5:
            # interleaved parity rows (the regular fast path)
            buf.line_number[:] = 1 + np.arange(n)
        else:
            buf.line_number[:] = rng.integers(0, 600, n)
        buf.frame_number[:] = rng.integers(0, 3, n)
        buf.service[:] = rng.choice([0, 0, 0, 0, 1, 3, 7], n)
        buf.forced_bad[:] = rng.random(n) < 0.1
        buf.ref_level[:] = rng.integers(0, 255, n)
        crc = buf.calc_crc()
        buf.source_crc = np.where(rng.random(n) < 0.6, crc, crc ^ 1)
        buf.invalidate_crc()
        fr = st.FrameAsm()
        fr.frame_number = int(rng.integers(0, 3))
        if rng.random() < 0.15:
            fr.even_top_data = fr.even_bottom_data = 0
        else:
            fr.even_top_data = int(rng.integers(0, 300))
            fr.even_bottom_data = fr.even_top_data \
                + int(rng.integers(0, 500))
        fr.odd_top_data = int(rng.integers(0, 300))
        fr.odd_bottom_data = fr.odd_top_data + int(rng.integers(0, 500))
        nat = s._split_one(fr, buf, key=("k",))
        with monkeypatch.context() as m:
            m.setattr(sn, "available", lambda: False)
            ref = s._split_one(fr, buf, key=("k",))
        assert nat["max_line"] == ref["max_line"], trial
        for parity in ("even", "odd"):
            assert nat[parity + "_data"] == ref[parity + "_data"], trial
            assert nat[parity + "_valid"] == ref[parity + "_valid"], trial
            _cmp_store(nat[parity], ref[parity])
