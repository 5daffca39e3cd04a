"""PCM-1 header-line PRODUCER: the fixed header word pattern with source
CRC 0xCCCC (pcm1line.cpp:314-323) is detected in from_decoded and tagged
SRV_HEADER — anchoring vertical alignment and the emphasis flag without
any manual service tagging."""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm1
from sdvpcmdecoder_tpu.ops import pcm1_deint as di1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1


def _header_row():
    return np.array(pcm1.HEADER_WORDS, np.int64), pcm1.HEADER_CRC


def _frame_with_raw_headers(left, right, trailing=False):
    """Frame whose header lines exist only as WORD PATTERNS."""
    S = di1.FIELD_SUBLINES
    hw, hc = _header_row()
    stores = []
    for half, parity in enumerate(("odd", "even")):
        l13 = left[half * S:(half + 1) * S]
        r13 = right[half * S:(half + 1) * S]
        sl, sr = di1.interleave_field(l13, r13)
        words = np.zeros((sp1.LINES_PF, 6), dtype=np.int64)
        for k in range(3):
            words[:, 2 * k] = sl[k::3]
            words[:, 2 * k + 1] = sr[k::3]
        crcs = np.asarray(pcm1.calc_crc(words, xp=np))
        # prepend a raw header line (and optionally a trailing one)
        words = np.concatenate([hw[None], words])
        crcs = np.concatenate([[hc], crcs])
        if trailing:
            words = np.concatenate([words, hw[None]])
            crcs = np.concatenate([crcs, [hc]])
        base = 1 if parity == "odd" else 2
        nums = base + 2 * np.arange(len(words))
        stores.append(sp1.PCM1LineStore.from_decoded(
            words, crcs, np.ones(len(words)), nums))
    return sp1.PCM1LineStore.concat(stores)


def test_is_header_detects_pattern():
    hw, hc = _header_row()
    assert bool(pcm1.is_header(hw, hc))
    assert not bool(pcm1.is_header(hw, 0x1234))
    assert not bool(pcm1.is_header(hw * 0 + 1, hc))


def test_from_decoded_produces_srv_header():
    st = _frame_with_raw_headers(np.zeros(2 * di1.FIELD_SUBLINES, int),
                                 np.zeros(2 * di1.FIELD_SUBLINES, int))
    assert (st.service == sp1.SRV_HEADER).sum() == 2
    # header lines never count as data
    hdr_rows = np.nonzero(st.service == sp1.SRV_HEADER)[0]
    assert set(st.line_number[hdr_rows]) == {1, 2}


def test_header_anchored_decode_and_emphasis():
    rng = np.random.default_rng(6)
    n = 2 * di1.FIELD_SUBLINES
    left = rng.integers(0, 1 << 13, size=n)
    right = rng.integers(0, 1 << 13, size=n)
    # Leading headers only: header_present, no emphasis.
    s = sp1.PCM1Stitcher()
    s.push_frame(_frame_with_raw_headers(left, right))
    pairs = [p for p in s.pop_samples() if p.service == sp1.SRV_NO]
    el = np.asarray(pcm1.expand_sample(left, xp=np))
    np.testing.assert_array_equal(np.array([p.left for p in pairs]), el)
    assert s.header_present and not s.emphasis_set
    assert not s.frame_log[0].emphasis

    # Leading + trailing headers: emphasis marker set and propagated.
    s2 = sp1.PCM1Stitcher()
    s2.push_frame(_frame_with_raw_headers(left, right, trailing=True))
    pairs2 = [p for p in s2.pop_samples() if p.service == sp1.SRV_NO]
    np.testing.assert_array_equal(np.array([p.left for p in pairs2]), el)
    assert s2.emphasis_set
    assert s2.frame_log[0].emphasis
    assert all(p.emphasis for p in pairs2)
