"""PCM-16x0 path tests: block decode, P correction, SI stitcher."""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm16x0
from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16


def _field_samples(n_pairs, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 16, size=n_pairs),
            rng.integers(1, 1 << 16, size=n_pairs))


def test_si_roundtrip_clean():
    n_lines = sp16.LINES_PF  # 245 lines -> 735 sublines -> 7 super-blocks
    usable = (n_lines * 3 // sp16.SI_TRUE_INTERLEAVE) \
        * sp16.SI_TRUE_INTERLEAVE
    left, right = _field_samples(usable, seed=1)
    sub, n_pairs = di16.interleave_field(left, right, n_lines)
    assert n_pairs == usable
    shifts, orders = [], []
    for g in range(usable // sp16.SI_TRUE_INTERLEAVE):
        for i in range(di16.SI_OFS):
            shifts.append(g * sp16.SI_TRUE_INTERLEAVE + i)
            orders.append(i % 2 == 1)
    res = di16.decode_blocks(sub, np.ones(len(sub), bool),
                             np.asarray(shifts), np.asarray(orders))
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    er = np.asarray(pcm16x0.expand_sample(right, xp=np))
    got_l = res["samples"][..., 0].reshape(-1)
    got_r = res["samples"][..., 1].reshape(-1)
    np.testing.assert_array_equal(got_l, el)
    np.testing.assert_array_equal(got_r, er)
    assert res["block_valid"].all()
    assert (res["state"] == di16.AUD_ORIG).all()


def test_si_p_correction():
    n_lines = 35  # one super-block (105 sublines)
    left, right = _field_samples(105, seed=2)
    sub, _ = di16.interleave_field(left, right, n_lines)
    sub = sub.copy()
    sub[10, :] ^= [0x1111, 0x2222, 0x3333]  # corrupt the subline's words
    ok = np.ones(len(sub), bool)
    ok[10] = False  # one bad subline -> 1 erasure per sub-block of block 10
    shifts = np.arange(di16.SI_OFS)
    orders = (shifts % 2) == 1
    res = di16.decode_blocks(sub, ok, shifts, orders)
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    got_l = res["samples"][..., 0].reshape(-1)
    np.testing.assert_array_equal(got_l, el)
    assert res["block_valid"].all()
    assert (res["state"][10] != di16.AUD_ORIG).any()  # P-fixed


def test_si_broken_detection():
    n_lines = 35
    left, right = _field_samples(105, seed=3)
    sub, _ = di16.interleave_field(left, right, n_lines)
    sub = sub.copy()
    sub[10, 1] ^= 0x55  # corrupt a word but leave CRC flag valid
    res = di16.decode_blocks(sub, np.ones(len(sub), bool),
                             np.arange(di16.SI_OFS),
                             (np.arange(di16.SI_OFS) % 2) == 1)
    assert (res["state"][10] == di16.AUD_BROKEN).any()


def _mk_store(sub, n_lines, frame_number=1, parity_base=1, crc_ok=None):
    S = len(sub)
    crcs = pcm16x0.calc_crc(sub, xp=np)
    if crc_ok is not None:
        crcs = np.where(crc_ok, crcs, crcs ^ 0xFFFF)
    lines = parity_base + 2 * (np.arange(S) // 3)
    parts = np.arange(S) % 3
    return sp16.PCM16X0LineStore.from_decoded(
        sub, crcs, np.full(S, frame_number), lines, parts)


def test_si_stitcher_roundtrip():
    lpf = sp16.LINES_PF
    usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    lo, ro = _field_samples(usable, seed=4)
    le, re_ = _field_samples(usable, seed=5)
    sub_o, _ = di16.interleave_field(lo, ro, lpf)
    sub_e, _ = di16.interleave_field(le, re_, lpf)
    store = sp16.PCM16X0LineStore.concat([
        _mk_store(sub_o, lpf, parity_base=1),
        _mk_store(sub_e, lpf, parity_base=2)])
    tag = sp16.PCM16X0LineStore(1)
    tag.service[0] = sp16.SRV_NEW_FILE
    tag.frame_number[0] = 1
    store = sp16.PCM16X0LineStore.concat([tag, store])
    s = sp16.PCM16X0Stitcher()
    s.push_frame(store)
    pairs = [p for p in s.pop_samples() if p.service == sp16.SRV_NO]
    el = np.asarray(pcm16x0.expand_sample(lo, xp=np))
    out_l = np.array([p.left for p in pairs])
    # First field output (odd, TFF) must match ground truth.
    np.testing.assert_array_equal(out_l[:usable], el)
    assert all(p.left_valid for p in pairs[:usable])
    fr = s.frame_log[0]
    assert fr.padding_ok


def test_si_stitcher_detects_padding():
    lpf = sp16.LINES_PF
    usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    lo, ro = _field_samples(usable, seed=6)
    sub_o, _ = di16.interleave_field(lo, ro, lpf)
    # Crop 4 LINES (12 sublines) from the top of the field: the sweep must
    # find padding 4 to realign the interleave grid.
    crop = 4
    sub_cropped = sub_o[3 * crop:]
    store = _mk_store(sub_cropped, lpf - crop, parity_base=1 + 2 * crop)
    even = sp16.PCM16X0LineStore(0)
    s = sp16.PCM16X0Stitcher()
    ok, padding = s.find_si_padding(store)
    assert ok
    assert padding == crop, padding


def test_ei_interleave_roundtrip():
    """EI (PCM-1630) geometry: 490-subline offsets across the frame."""
    n_lines = 2 * sp16.LINES_PF  # whole frame of sublines
    usable = di16.EI_OFS * 3
    left, right = _field_samples(usable, seed=9)
    sub = np.zeros((n_lines * 3, 3), dtype=np.int64)
    # Encode one EI block set: block i uses sublines i, i+490, i+980.
    shifts = np.arange(di16.EI_OFS)
    orders = (shifts % 2) == 1
    for i in range(di16.EI_OFS):
        eo = bool(orders[i])
        rows = [i, i + di16.EI_OFS, i + 2 * di16.EI_OFS]
        for blk in range(3):
            p = 3 * i + blk
            lval = int(left[p])
            rval = int(right[p])
            sub[rows[di16._line_of_word(eo, blk, 0)], blk] = lval
            sub[rows[di16._line_of_word(eo, blk, 1)], blk] = rval
            sub[rows[di16._line_of_word(eo, blk, 2)], blk] = lval ^ rval
    res = di16.decode_blocks(sub, np.ones(len(sub), bool), shifts, orders,
                             ei=True)
    assert res["block_valid"].all()
    got_l = res["samples"][..., 0].reshape(-1)
    el = np.asarray(pcm16x0.expand_sample(left, xp=np))
    np.testing.assert_array_equal(got_l, el)


def test_zero_control_bit_alignment():
    """The zero control bit repeating every 105 sublines anchors the
    interleave grid (findZeroControlBitOffset port)."""
    lpf = sp16.LINES_PF
    usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    lo, ro = _field_samples(usable, seed=10)
    sub, _ = di16.interleave_field(lo, ro, lpf)
    store = _mk_store(sub, lpf)
    # Control bits: 0 at line_index < 4 lines of each interleave block
    # (BIT_*_OFS region), 1 elsewhere.
    S = len(store)
    pos = np.arange(S) % sp16.SI_TRUE_INTERLEAVE
    store.control_bit = ~(pos < sp16.BIT_CODE_OFS + 3)
    s = sp16.PCM16X0Stitcher()
    z = s.find_zero_control_bit_offset(store)
    assert z >= 0
    assert s.padding_from_zero_offset(z) == 0
    # Crop 5 lines from the top: the anchor must imply padding 5.
    crop = 5
    store2 = store.take(np.arange(3 * crop, S))
    z2 = s.find_zero_control_bit_offset(store2)
    assert s.padding_from_zero_offset(z2) == crop


def test_ei_interfield_padding():
    """EI stitcher: a field-1 bottom crop is recovered by the
    inter-field padding sweep (findEIPadding port)."""
    lpf = sp16.LINES_PF  # frame = 2*735 = 1470 sublines = one EI set
    usable = di16.EI_OFS * 3
    lo, ro = _field_samples(usable, seed=11)
    sub, _ = di16.interleave_field(lo, ro, 2 * lpf, ei=True)
    half = sp16.SUBLINES_PF
    crop = 6  # lines cut off the bottom of field 1
    f1 = _mk_store(sub[:half - 3 * crop], lpf - crop, parity_base=1)
    f2 = _mk_store(sub[half:], lpf, parity_base=2)
    s = sp16.PCM16X0Stitcher(fmt=sp16.FORMAT_EI)
    ok, pad, st = s.find_ei_padding(f1, f2)
    assert ok, st
    assert pad == crop, pad
    # Uncropped fields need no padding.
    f1f = _mk_store(sub[:half], lpf, parity_base=1)
    ok2, pad2, _ = s.find_ei_padding(f1f, f2)
    assert ok2 and pad2 == 0


def test_ei_bff_field_order():
    """BFF EI capture decodes bit-exact with the BFF preset. (The
    padding sweep alone cannot distinguish orders on clean data: the
    XOR parity is label-invariant under the half-frame rotation, which
    also holds for the reference's TFF-first tryEIPadding; the UNK
    fallback only resolves cases where the first order fails.)"""
    lpf = sp16.LINES_PF
    usable = di16.EI_OFS * 3
    lo, ro = _field_samples(usable, seed=21)
    sub, _ = di16.interleave_field(lo, ro, 2 * lpf, ei=True)
    half = sp16.SUBLINES_PF
    # BFF: the EVEN field comes first in the stream.
    f_even = _mk_store(sub[:half], lpf, parity_base=2)
    f_odd = _mk_store(sub[half:], lpf, parity_base=1)
    store = sp16.PCM16X0LineStore.concat([f_odd, f_even])
    tag = sp16.PCM16X0LineStore(1)
    tag.service[0] = sp16.SRV_NEW_FILE
    tag.frame_number[0] = 1
    store = sp16.PCM16X0LineStore.concat([tag, store])
    s = sp16.PCM16X0Stitcher(fmt=sp16.FORMAT_EI,
                             field_order=sp16.ORDER_BFF)
    s.push_frame(store)
    fr = s.frame_log[0]
    assert fr.field_order == sp16.ORDER_BFF
    assert fr.padding_ok
    pairs = [p for p in s.pop_samples() if p.service == sp16.SRV_NO]
    el = np.asarray(pcm16x0.expand_sample(lo, xp=np))
    out_l = np.array([p.left for p in pairs])
    np.testing.assert_array_equal(out_l[:len(el)], el[:len(out_l)])


def test_batched_si_padding_matches_serial():
    """batched_si_padding_stats == per-pad try_si_padding, incl. crops
    and corruption."""
    rng = np.random.default_rng(9)
    lpf = sp16.LINES_PF
    usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    left, right = _field_samples(usable, seed=9)
    sub, _ = di16.interleave_field(left, right, lpf)
    for crop, bad in ((0, 0.0), (4, 0.0), (7, 0.2), (11, 0.6)):
        w = sub[3 * crop:].copy()
        crcs = np.asarray(pcm16x0.calc_crc(w, xp=np))
        n = len(w)
        flip = rng.random(n) < bad
        crcs[flip] ^= 0x5555
        store = sp16.PCM16X0LineStore.from_decoded(
            w, crcs, np.full(n, 1), 1 + 2 * (crop + np.arange(n) // 3),
            np.arange(n) % 3)
        s = sp16.PCM16X0Stitcher()
        batched = s.batched_si_padding_stats(store, sp16.MAX_PADDING_SI)
        serial = [s.try_si_padding(store, p)
                  for p in range(sp16.MAX_PADDING_SI)]
        assert batched == serial, (crop, bad)


def test_find_si_padding_short_field_no_crash():
    """A field shorter than one super-block must not crash the sweep
    (review regression: 3-tuple/2-tuple mismatch)."""
    s = sp16.PCM16X0Stitcher()
    ok, pad = s.find_si_padding(sp16.PCM16X0LineStore(30))
    assert pad == 0
    batched = s.batched_si_padding_stats(sp16.PCM16X0LineStore(30), 8)
    serial = [s.try_si_padding(sp16.PCM16X0LineStore(30), p)
              for p in range(8)]
    assert [b[1] for b in batched] == [x[1] for x in serial]


def test_batched_ei_padding_matches_serial():
    """batched_ei_padding_stats (one row-mapped decode call) must be
    bit-identical to the serial try_ei_padding loop over all paddings."""
    lpf = sp16.LINES_PF
    usable = di16.EI_OFS * 3
    lo, ro = _field_samples(usable, seed=33)
    sub, _ = di16.interleave_field(lo, ro, 2 * lpf, ei=True)
    half = sp16.SUBLINES_PF
    crop = 9
    f1 = _mk_store(sub[:half - 3 * crop], lpf - crop, parity_base=1)
    f2 = _mk_store(sub[half:], lpf, parity_base=2)
    s = sp16.PCM16X0Stitcher(fmt=sp16.FORMAT_EI)
    serial = [s.try_ei_padding(f1, f2, pad)
              for pad in range(sp16.MAX_PADDING_EI)]
    batched = s.batched_ei_padding_stats(f1, f2,
                                         range(sp16.MAX_PADDING_EI))
    assert len(serial) == len(batched)
    for a, b in zip(serial, batched):
        assert (a.index, a.valid, a.silent, a.unchecked, a.broken) == \
            (b.index, b.valid, b.silent, b.unchecked, b.broken)


def test_ei_try_previous_fast_path():
    """With a padding already in the history, find_ei_padding accepts it
    without the 81-wide sweep (STG_TRY_PREVIOUS,
    findEIFrameStitching :3610) — and yields the same answer."""
    lpf = sp16.LINES_PF
    usable = di16.EI_OFS * 3
    lo, ro = _field_samples(usable, seed=34)
    sub, _ = di16.interleave_field(lo, ro, 2 * lpf, ei=True)
    half = sp16.SUBLINES_PF
    crop = 4
    f1 = _mk_store(sub[:half - 3 * crop], lpf - crop, parity_base=1)
    f2 = _mk_store(sub[half:], lpf, parity_base=2)
    s = sp16.PCM16X0Stitcher(fmt=sp16.FORMAT_EI)
    ok, pad, _ = s.find_ei_padding(f1, f2)
    assert ok and pad == crop
    s.stats_padding = [crop, crop]
    calls = []
    orig = s.batched_ei_padding_stats
    s.batched_ei_padding_stats = \
        lambda *a, **k: calls.append(1) or orig(*a, **k)
    ok2, pad2, _ = s.find_ei_padding(f1, f2)
    assert ok2 and pad2 == crop
    assert calls == []                  # sweep skipped entirely


def test_prescan_false_pos_reference_rule():
    """prescanForFalsePosCRCs (pcm16x0datastitcher.cpp:753-836) pinned:
    a line whose ONLY valid subline is the LEFT part with picked bits
    (or only the RIGHT with picked-right) is forced bad — and, unlike
    the round-2 stand-in heuristic, a valid all-zero subline amid
    invalid neighbors is NOT touched (the two rules disagree here)."""
    rng = np.random.default_rng(50)
    n_lines = 8
    store = sp16.PCM16X0LineStore(n_lines * 3)
    store.line_part = np.tile(np.arange(3, dtype=np.int8), n_lines)
    store.line_number = 1 + 2 * np.repeat(np.arange(n_lines), 3)
    store.frame_number[:] = 1
    # all sublines invalid by default (source_crc mismatches zero words)
    w = rng.integers(1, 1 << 16, (n_lines * 3, 3)).astype(np.int64)
    store.words = w
    store.source_crc = np.asarray(pcm16x0.calc_crc(w, xp=np)).copy()
    # line 2: only LEFT part valid, with picked-left bits -> forced bad
    store.source_crc[2 * 3 + 1] ^= 1
    store.source_crc[2 * 3 + 2] ^= 1
    store.picked_left[2 * 3] = 3
    # line 3: only LEFT part valid but NO picked bits -> kept
    store.source_crc[3 * 3 + 1] ^= 1
    store.source_crc[3 * 3 + 2] ^= 1
    # line 4: only RIGHT part valid with picked-right -> forced bad
    store.source_crc[4 * 3 + 0] ^= 1
    store.source_crc[4 * 3 + 1] ^= 1
    store.picked_right[4 * 3 + 2] = 2
    # line 5: a valid all-zero subline amid invalid neighbors — the old
    # heuristic would invalidate it; the reference rule must NOT
    store.words[5 * 3 + 1] = 0
    store.source_crc[5 * 3 + 1] = pcm16x0.CRC_SILENT
    store.source_crc[5 * 3 + 0] ^= 1
    store.source_crc[5 * 3 + 2] ^= 1
    store.source_crc[6 * 3 + 0] ^= 1
    store.source_crc[6 * 3 + 1] ^= 1
    store.source_crc[6 * 3 + 2] ^= 1

    s = sp16.PCM16X0Stitcher()
    out = s.prescan_false_pos(store)
    assert out.forced_bad[2 * 3:2 * 3 + 3].all()      # left+picked
    assert not out.forced_bad[3 * 3:3 * 3 + 3].any()  # no picked bits
    assert out.forced_bad[4 * 3:4 * 3 + 3].all()      # right+picked
    assert not out.forced_bad[5 * 3 + 1]              # silent kept
