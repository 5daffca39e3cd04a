"""Native frame trim/service scan (stc007_trim_scan) == numpy twin."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def test_trim_scan_differential(monkeypatch):
    rng = np.random.default_rng(0)
    s = st.STC007Stitcher.__new__(st.STC007Stitcher)
    for trial in range(120):
        n = int(rng.integers(1, 700))
        buf = st.LineStore(n)
        buf.words[:] = rng.integers(0, 1 << 14, (n, 8))
        buf.line_number[:] = rng.integers(0, 600, n)
        buf.frame_number[:] = rng.integers(0, 3, n)
        buf.service[:] = rng.choice([0, 0, 0, 0, 1, 2, 7], n)
        buf.forced_bad[:] = rng.random(n) < 0.1
        buf.has_markers[:] = rng.random(n) < 0.3
        crc = buf.calc_crc()
        match = rng.random(n) < 0.5
        buf.source_crc = np.where(match, crc, crc ^ 1)
        buf.invalidate_crc()
        fno = int(rng.integers(0, 3))
        nat = s._scan_frame(fno, buf)
        with monkeypatch.context() as m:
            m.setattr(sn, "available", lambda: False)
            ref = s._scan_frame(fno, buf)
        assert nat == ref, (trial, nat, ref)
