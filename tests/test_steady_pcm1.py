"""PCM-1 steady-frame fast path (pcm1_steady_frame) == push_frame."""
import dataclasses

import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
from sdvpcmdecoder_tpu.ops import stitch_native as sn
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st

pytestmark = pytest.mark.skipif(not sn.available(),
                                reason="native core unavailable")


def _frame_store(fno, seed, bad_frac=0.0, crop=0, header=False):
    rng = np.random.default_rng(seed)
    parts = []
    for parity_base, s in ((1, seed * 2), (2, seed * 2 + 1)):
        left = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
        right = rng.integers(0, 1 << 13, di1.FIELD_SUBLINES)
        sl, sr = di1.interleave_field(left, right)
        words = np.zeros((sp1.LINES_PF, 6), np.int64)
        words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
        words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
        crcs = np.asarray(pcm1.calc_crc(words, xp=np))
        if bad_frac:
            bad = rng.random(sp1.LINES_PF) < bad_frac
            crcs = np.where(bad, crcs ^ 0x3C3C, crcs)
        lines = parity_base + 2 * np.arange(sp1.LINES_PF)
        if crop:
            words, crcs, lines = (words[crop:], crcs[crop:], lines[crop:])
        store = sp1.PCM1LineStore.from_decoded(
            words, crcs, np.full(len(crcs), fno), lines,
            ref_level=np.full(len(crcs), 110))
        parts.append(store)
    out = sp1.PCM1LineStore.concat(parts)
    if header:
        h = sp1.PCM1LineStore(1)
        h.service[0] = sp1.SRV_HEADER
        h.frame_number[0] = fno
        h.line_number[0] = 1
        out = sp1.PCM1LineStore.concat([h, out])
    return out


def _run(n_frames, disable, seed=0, bad_frac=0.0, crop=0,
         header_at=None, **kw):
    s = sp1.PCM1Stitcher(**kw)
    hits = [0]
    if disable:
        s._try_steady_frame = lambda buf, fr: False
    else:
        orig = sp1.PCM1Stitcher._try_steady_frame

        def spy(buf, fr, _s=s):
            r = orig(_s, buf, fr)
            if r:
                hits[0] += 1
            return r
        s._try_steady_frame = spy
    for f in range(n_frames):
        s.push_frame(_frame_store(f + 1, seed + f, bad_frac=bad_frac,
                                  crop=crop, header=(header_at == f)))
    arr = st.chunks_to_arrays(s.pop_sample_chunks())
    log = [dataclasses.asdict(f) for f in s.frame_log]
    return arr, log, hits[0]


def _assert_equal(a, b, tag):
    assert (a[0] is None) == (b[0] is None), tag
    if a[0] is not None:
        for x, y in zip(a[0][:3], b[0][:3]):
            np.testing.assert_array_equal(x, y, err_msg=tag)
        assert a[0][3] == b[0][3], tag
    assert len(a[1]) == len(b[1]), tag
    for i, (f1, f2) in enumerate(zip(a[1], b[1])):
        assert f1 == f2, (tag, i,
                          {k: (f1[k], f2[k]) for k in f1 if f1[k] != f2[k]})


@pytest.mark.parametrize("bad,crop", [(0.0, 0), (0.08, 0), (0.0, 5),
                                      (0.15, 9)])
def test_pcm1_steady_matches(bad, crop):
    f = _run(5, False, seed=1, bad_frac=bad, crop=crop)
    r = _run(5, True, seed=1, bad_frac=bad, crop=crop)
    _assert_equal(f, r, f"bad={bad} crop={crop}")
    assert f[2] >= 5


def test_pcm1_manual_offsets_match():
    kw = dict(auto_offset=False, odd_offset=2, even_offset=-1)
    f = _run(4, False, seed=7, **kw)
    r = _run(4, True, seed=7, **kw)
    _assert_equal(f, r, "manual")
    assert f[2] >= 4


def test_pcm1_header_frames_defer():
    f = _run(5, False, seed=3, header_at=2)
    r = _run(5, True, seed=3, header_at=2)
    _assert_equal(f, r, "header")
    assert f[2] == 4  # the header frame deferred


def test_pcm1_steady_config_fuzz():
    """Deterministic mini-fuzz over corruption/crops/offsets/headers."""
    rng = np.random.default_rng(777)
    for trial in range(6):
        kw = dict(seed=int(rng.integers(0, 100000)),
                  bad_frac=float(rng.choice([0, .03, .1, .25])),
                  crop=int(rng.choice([0, 0, 3, 7, 15])))
        if rng.random() < 0.3:
            kw.update(auto_offset=False,
                      odd_offset=int(rng.integers(-3, 4)),
                      even_offset=int(rng.integers(-3, 4)))
        if rng.random() < 0.25:
            kw["header_at"] = int(rng.integers(0, 4))
        n = int(rng.integers(3, 7))
        f = _run(n, False, **kw)
        r = _run(n, True, **kw)
        _assert_equal(f, r, f"fuzz t{trial}")
