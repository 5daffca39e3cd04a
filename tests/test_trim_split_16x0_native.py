"""PCM-16x0 native trim/split scans == numpy twins."""
import copy

import numpy as np
import pytest

from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def test_trim_split_differential(monkeypatch):
    rng = np.random.default_rng(11)
    sti = sp.PCM16X0Stitcher()
    for trial in range(100):
        n = int(rng.integers(1, 1500))
        buf = sp.PCM16X0LineStore(n)
        buf.words[:] = rng.integers(0, 1 << 16, (n, 3))
        buf.line_number[:] = rng.integers(0, 600, n)
        buf.frame_number[:] = rng.integers(0, 3, n)
        buf.service[:] = rng.choice([0, 0, 0, 0, 1, 2, 3], n)
        buf.forced_bad[:] = rng.random(n) < 0.1
        buf.bw_set[:] = rng.random(n) < 0.7
        crc = np.asarray(sn.pcm_crc_rows(buf.words, "pcm16x0"), np.int64)
        buf.source_crc = np.where(rng.random(n) < 0.5, crc, crc ^ 1)
        buf.invalidate_crc()
        fr = sp.FrameAsmPCM16X0()
        fr.frame_number = int(rng.integers(0, 3))
        if rng.random() > 0.2:
            fr.even_top_data = int(rng.integers(0, 300))
            fr.even_bottom_data = fr.even_top_data \
                + int(rng.integers(0, 400))
        fr.odd_top_data = int(rng.integers(0, 300))
        fr.odd_bottom_data = fr.odd_top_data + int(rng.integers(0, 400))
        fr2 = copy.deepcopy(fr)
        sti._find_trim(buf, fr)
        flags_nat = (sti.file_start, sti.file_end)
        fields_nat = sti._split_fields(buf, fr)
        with monkeypatch.context() as m:
            m.setattr(sn, "available", lambda: False)
            sti._find_trim(buf, fr2)
            flags_ref = (sti.file_start, sti.file_end)
            fields_ref = sti._split_fields(buf, fr2)
        assert flags_nat == flags_ref, trial
        for a in ("even_top_data", "even_bottom_data", "odd_top_data",
                  "odd_bottom_data", "even_data_lines", "odd_data_lines",
                  "even_valid_lines", "odd_valid_lines"):
            assert getattr(fr, a) == getattr(fr2, a), (trial, a)
        for name in ("even", "odd"):
            for f in sp.PCM16X0LineStore.FIELDS:
                np.testing.assert_array_equal(
                    getattr(fields_nat[name], f),
                    getattr(fields_ref[name], f))
