"""PCM-16x0 control-bit stream statistics (collectCtrlBitStats :4745).

The 129th-bit stream is decoded at BIT_*_OFS of every interleave block
across the whole frame with majority voting and a 65-deep history —
single flipped bits or bad-CRC sublines must not change the decoded
emphasis/sample-rate/mode/code flags.
"""
import numpy as np

from sdvpcmdecoder_tpu.formats import pcm16x0
from sdvpcmdecoder_tpu.ops import pcm16x0_deint as di16
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16


def _field_samples(n_pairs, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 16, size=n_pairs),
            rng.integers(1, 1 << 16, size=n_pairs))


def _mk_store(sub, frame_number=1, parity_base=1, control_bit=None):
    S = len(sub)
    crcs = pcm16x0.calc_crc(sub, xp=np)
    lines = parity_base + 2 * (np.arange(S) // 3)
    parts = np.arange(S) % 3
    return sp16.PCM16X0LineStore.from_decoded(
        sub, crcs, np.full(S, frame_number), lines, parts,
        control_bit=control_bit)


def _ctrl_bits(n_sublines, emphasis=True, rate44100=True, ei=False,
               code=False):
    """Control-bit stream for one field: a ZERO bit votes enabled /
    44100 / EI / code (reference active-low convention)."""
    cb = np.ones(n_sublines, bool)
    for iblk in range(7):
        base = iblk * sp16.SI_TRUE_INTERLEAVE + 1
        cb[base + sp16.BIT_EMPHASIS_OFS] = not emphasis
        cb[base + sp16.BIT_SAMPLERATE_OFS] = not rate44100
        cb[base + sp16.BIT_MODE_OFS] = not ei
        cb[base + sp16.BIT_CODE_OFS] = not code
    return cb


def _frame_store(seed=4, **flags):
    lpf = sp16.LINES_PF
    usable = (lpf * 3 // sp16.SI_TRUE_INTERLEAVE) * sp16.SI_TRUE_INTERLEAVE
    lo, ro = _field_samples(usable, seed=seed)
    le, re_ = _field_samples(usable, seed=seed + 1)
    sub_o, _ = di16.interleave_field(lo, ro, lpf)
    sub_e, _ = di16.interleave_field(le, re_, lpf)
    cb = _ctrl_bits(len(sub_o), **flags)
    odd = _mk_store(sub_o, parity_base=1, control_bit=cb)
    even = _mk_store(sub_e, parity_base=2, control_bit=cb)
    return odd, even


def test_ctrl_bits_decoded_from_stream():
    odd, even = _frame_store(emphasis=True, rate44100=False)
    s = sp16.PCM16X0Stitcher()
    s.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    fr = s.frame_log[0]
    assert fr.emphasis is True
    assert fr.sample_rate == sp16.SAMPLE_RATE_44056
    assert not fr.ei_detected and not fr.code
    # history primed
    assert s.stats_emph and s.stats_rate


def test_single_flipped_bits_do_not_change_flags():
    odd, even = _frame_store(emphasis=True, rate44100=True)
    # Flip one block's emphasis + rate bits, and kill another block's
    # voting subline CRCs entirely.
    b3 = 3 * sp16.SI_TRUE_INTERLEAVE + 1
    odd.control_bit[b3 + sp16.BIT_EMPHASIS_OFS] = True   # votes "off"
    odd.control_bit[b3 + sp16.BIT_SAMPLERATE_OFS] = True  # votes 44056
    b5 = 5 * sp16.SI_TRUE_INTERLEAVE + 1
    even.forced_bad[b5:b5 + 12] = True                    # CRC-invalid
    s = sp16.PCM16X0Stitcher()
    s.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    fr = s.frame_log[0]
    assert fr.emphasis is True
    assert fr.sample_rate == sp16.SAMPLE_RATE_44100


def test_history_fallback_when_frame_unreadable():
    s = sp16.PCM16X0Stitcher()
    for seed in (4, 8):
        odd, even = _frame_store(seed=seed, emphasis=True,
                                 rate44100=False)
        s.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    # Third frame: every voting subline CRC-invalid -> fall back to the
    # 65-deep history instead of defaulting.
    odd, even = _frame_store(seed=12, emphasis=False, rate44100=True)
    for st in (odd, even):
        for iblk in range(7):
            base = iblk * sp16.SI_TRUE_INTERLEAVE + 1
            st.forced_bad[base:base + 12] = True
    s.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    fr = s.frame_log[-1]
    assert fr.emphasis is True                       # from history
    assert fr.sample_rate == sp16.SAMPLE_RATE_44056  # from history


def test_auto_format_switch_to_ei():
    odd, even = _frame_store(ei=True)
    s = sp16.PCM16X0Stitcher(auto_fmt=True)
    assert s.fmt == sp16.FORMAT_SI
    s.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    fr = s.frame_log[0]
    assert fr.ei_detected
    assert s.fmt == sp16.FORMAT_EI
    # without auto_fmt: detected but not switched
    odd, even = _frame_store(ei=True)
    s2 = sp16.PCM16X0Stitcher()
    s2.push_frame(sp16.PCM16X0LineStore.concat([odd, even]))
    assert s2.frame_log[0].ei_detected and s2.fmt == sp16.FORMAT_SI
