"""Good-params coordinate-search skip in PCMFrameDriver.

While decodes stay clean the driver must reuse its damped coordinate
history instead of re-sweeping sample lines every frame (the binarizer's
good-parameters skip, binarizer.cpp:1105-1141, lifted to frame scope),
and must fall back to the full search as soon as validity degrades.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import v2d_other
from sdvpcmdecoder_tpu.synth import encoder as enc


def _pcm1_frames(n_frames, W=1024, seed=7):
    rng = np.random.default_rng(seed)
    vids = []
    for f in range(n_frames):
        img = np.zeros((2 * sp1.LINES_PF, W), np.uint8) + 20
        for half in range(2):
            sl, sr = di1.interleave_field(
                rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES),
                rng.integers(0, 1 << 13, size=di1.FIELD_SUBLINES))
            words = np.zeros((sp1.LINES_PF, 6), np.int64)
            words[:, 0::2] = np.stack([sl[0::3], sl[1::3], sl[2::3]], 1)
            words[:, 1::2] = np.stack([sr[0::3], sr[1::3], sr[2::3]], 1)
            crcs = pcm1.calc_crc(words, xp=np)
            bits = pcm1.words_to_data_bits(words, crcs, xp=np)
            px, _ = enc.render_bits(bits, width=W, ppb=10.0)
            img[half::2] = px
        vids.append(img)
    return np.stack(vids)


def _counting(monkeypatch):
    calls = {"n": 0}
    orig = ld.search_coordinates

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ld, "search_coordinates", counted)
    return calls


def test_skip_engages_on_clean_stream(monkeypatch):
    calls = _counting(monkeypatch)
    frames = _pcm1_frames(8)
    drv = v2d_other.PCMFrameDriver("pcm1")
    results = []
    for i in range(0, 8, 2):
        results.extend(drv.decode_frames(frames[i:i + 2]))
    assert all(r is not None and r.valid.all() for r in results)
    # Batch 1 (2 frames) searches in full; every later frame rides the
    # history.  Without the skip this would be >= 8 * COORD_CHECK_LINES.
    assert calls["n"] <= 2 * v2d_other.COORD_CHECK_LINES
    assert drv._last_good


def test_search_resumes_on_degradation(monkeypatch):
    calls = _counting(monkeypatch)
    frames = _pcm1_frames(4)
    drv = v2d_other.PCMFrameDriver("pcm1")
    drv.decode_frames(frames[:2])
    n_clean = calls["n"]
    drv.decode_frames(frames[2:])          # skip path: no new searches
    assert calls["n"] == n_clean
    noise = np.random.default_rng(0).integers(
        0, 255, size=frames[:1].shape).astype(np.uint8)
    drv.decode_frames(noise)               # degrades -> _last_good False
    assert not drv._last_good
    before = calls["n"]
    drv.decode_frames(frames[:1])          # must search again
    assert calls["n"] > before


def test_periodic_refresh(monkeypatch):
    calls = _counting(monkeypatch)
    frames = _pcm1_frames(2)
    drv = v2d_other.PCMFrameDriver("pcm1")
    drv.decode_frames(frames[:1])
    base = calls["n"]
    # SEARCH_REFRESH clean frames in a row must trigger one re-search.
    for _ in range(v2d_other.SEARCH_REFRESH + 1):
        drv.decode_frames(frames[1:])
    assert calls["n"] > base


def test_refresh_is_narrow_and_falls_back_full(monkeypatch):
    """The periodic refresh sweeps a narrow window around the locked
    coordinates; an abrupt coordinate jump makes the narrow pass miss
    and the full-width retry must recover the new coordinates."""
    widths = []
    orig = ld.search_coordinates

    def spy(*a, **k):
        widths.append(k.get("max_ofs"))
        return orig(*a, **k)

    monkeypatch.setattr(ld, "search_coordinates", spy)
    frames = _pcm1_frames(2)
    drv = v2d_other.PCMFrameDriver("pcm1")
    drv.decode_frames(frames[:1])
    assert set(widths) == {None}  # bootstrap: full width
    widths.clear()
    for _ in range(v2d_other.SEARCH_REFRESH + 1):
        drv.decode_frames(frames[1:])
    assert widths and all(w is not None for w in widths), \
        "refresh must sweep narrow"

    # A narrow refresh that finds NOTHING must retry at full width in
    # the same frame (robustness is never below the pre-narrow policy).
    widths.clear()

    def narrow_blind(*a, max_ofs=None, **k):
        widths.append(max_ofs)
        if max_ofs is not None:
            return None  # simulate drift beyond the narrow window
        return orig(*a, **k)

    monkeypatch.setattr(ld, "search_coordinates", narrow_blind)
    for _ in range(v2d_other.SEARCH_REFRESH + 1):
        drv.decode_frames(frames[1:])
    assert any(w is not None for w in widths)
    assert None in widths, \
        "a blind narrow refresh must fall back to the full sweep"
