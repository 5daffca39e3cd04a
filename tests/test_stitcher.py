"""STC-007 stitcher tests: field reassembly, padding detection, field
order, BROKEN-driven auto-stitch, sample output integrity."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc


def _mk_store(frame):
    n = len(frame["crcs"])
    store = st.LineStore.from_decoded(
        frame["line_words"], frame["crcs"], np.ones(n, bool),
        np.full(n, frame["frame_number"]), frame["line_numbers"])
    return store


def _run_stitcher(frames, lines_pf=294, **kw):
    s = st.STC007Stitcher(preset_video=st.VID_PAL if lines_pf == 294
                          else st.VID_NTSC, **kw)
    # First frame carries the new-file tag.
    first = _mk_store(frames[0])
    tag = st.LineStore(1)
    tag.service[0] = st.SRV_NEW_FILE
    tag.frame_number[0] = frames[0]["frame_number"]
    first = st.LineStore.concat([tag, first])
    s.push_frame(first)
    for fr in frames[1:]:
        s.push_frame(_mk_store(fr))
    s.finish()
    return s, s.pop_samples()


def _samples(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 14, size=n), rng.integers(1, 1 << 14, size=n))


def _expected(left, right):
    el = np.asarray(stc007.expand_sample(left, xp=np))
    er = np.asarray(stc007.expand_sample(right, xp=np))
    return el, er


def _audio_pairs(samples):
    return [p for p in samples if p.service == st.SRV_NO]


def test_full_fields_tff_roundtrip():
    lpf = 294
    n_frames = 4
    left, right = _samples(3 * n_frames * 2 * lpf, seed=0)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    s, samples = _run_stitcher(frames)
    pairs = _audio_pairs(samples)
    el, er = _expected(left, right)
    # Locate the first input sample in the output (leading file padding
    # shifts the start).
    out_l = np.array([p.left for p in pairs])
    out_r = np.array([p.right for p in pairs])
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0, "first sample not found in output"
    st0 = int(idx[0])
    # The synthetic capture cuts the interleave run-out: the last
    # MIN_DEINT_DATA lines' worth of blocks lose taps, so only samples
    # fully covered by real lines are checkable.
    n_good = 3 * (n_frames * 2 * lpf - stc007.MIN_DEINT_DATA - 32)
    n_check = min(n_good, len(pairs) - st0)
    assert n_check > 3 * (n_frames - 1) * 2 * lpf  # nearly all audio out
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], el[:n_check])
    np.testing.assert_array_equal(out_r[st0:st0 + n_check], er[:n_check])
    valid = np.array([p.left_valid and p.right_valid
                      for p in pairs[st0:st0 + n_check]])
    assert valid.all()
    # Frame log should show detected paddings of 0 and TFF order.
    mids = s.frame_log[1:-1]
    assert all(fr.field_order == st.ORDER_TFF for fr in mids)
    assert all(fr.inner_padding == 0 and fr.outer_padding == 0
               for fr in mids)


def test_bff_order_detected():
    lpf = 294
    n_frames = 4
    left, right = _samples(3 * n_frames * 2 * lpf, seed=1)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               order="bff")
    s, samples = _run_stitcher(frames)
    mids = s.frame_log[1:-1]
    assert all(fr.field_order == st.ORDER_BFF for fr in mids), \
        [fr.field_order for fr in mids]
    pairs = _audio_pairs(samples)
    el, er = _expected(left, right)
    out_l = np.array([p.left for p in pairs])
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_good = 3 * (n_frames * 2 * lpf - stc007.MIN_DEINT_DATA - 32)
    n_check = min(n_good, len(pairs) - st0)
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], el[:n_check])


@pytest.mark.parametrize("crop", [4, 9])
def test_bottom_crop_padding_detected(crop):
    """Cropping the bottom of each field must be rebuilt via the padding
    sweep (the reference's core auto-stitch capability)."""
    lpf = 294
    n_frames = 4
    left, right = _samples(3 * n_frames * 2 * lpf, seed=2)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               bottom_crop=crop)
    s, samples = _run_stitcher(frames)
    mids = s.frame_log[1:-1]
    for fr in mids:
        assert fr.inner_padding == crop, \
            (fr.frame_number, fr.inner_padding, fr.outer_padding)
        assert fr.inner_padding_ok
    pairs = _audio_pairs(samples)
    el, er = _expected(left, right)
    out_l = np.array([p.left for p in pairs])
    out_valid = np.array([p.left_valid for p in pairs])
    # All valid output samples must match ground truth at their position.
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_good = 3 * (n_frames * 2 * lpf - stc007.MIN_DEINT_DATA - 32)
    n_check = min(n_good, len(pairs) - st0)
    seg = out_l[st0:st0 + n_check]
    vmask = out_valid[st0:st0 + n_check]
    np.testing.assert_array_equal(seg[vmask], el[:n_check][vmask])
    # The cropped lines are silent-padded; ECC recovers words within its
    # correction distance, so the vast majority must still be valid.
    assert vmask.mean() > 0.8


def test_misaligned_without_masking_detected_broken():
    """Feeding fields with a wrong seam produces BROKEN blocks: the
    stitcher must not report the seam as valid padding."""
    lpf = 294
    left, right = _samples(3 * 4 * 2 * lpf, seed=3)
    frames = enc.encode_fields(left, right, 4, lines_pf=lpf)
    # Corrupt alignment: drop 3 lines from the top of field2 in frame 2
    # (top cut cannot be fixed by padding insertion at the seam).
    f = frames[1]
    n = len(f["crcs"])
    keep = np.ones(n, bool)
    keep[lpf:lpf + 3] = False
    for k in ("line_words", "crcs", "line_numbers"):
        f[k] = f[k][keep]
    s, samples = _run_stitcher(frames)
    fr = s.frame_log[1]
    # Frame 2's inner seam cannot be stitched cleanly.
    assert not fr.inner_padding_ok or fr.inner_padding != 0
