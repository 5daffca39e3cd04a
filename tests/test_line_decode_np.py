"""Host slow-path decoder: PCM-1/16x0 pixel decode, coordinate sweep,
bit picker, control bit."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.synth import encoder as enc


def _pcm1_line(seed=0):
    rng = np.random.default_rng(seed)
    words = rng.integers(0, 1 << 13, size=(1, 6))
    crc = int(pcm1.calc_crc(words, xp=np)[0])
    bits = pcm1.words_to_data_bits(words, np.asarray([crc]), xp=np)
    return words[0], crc, bits


def test_pcm1_pixel_decode_known_coords():
    words, crc, bits = _pcm1_line(1)
    pixels, (ds, de) = enc.render_bits(bits, width=1024, ppb=10.0)
    got_w, got_crc, calc, valid, d, s = ld.read_pcm_grid(
        ld.decode_trial_pcm1, pixels[0], ds, de, 110, 20, 200, 1024, 0, 2)
    assert valid
    assert got_w == list(words)
    assert got_crc == crc


def test_pcm1_coordinate_sweep_finds_data():
    words, crc, bits = _pcm1_line(2)
    pixels, (ds, de) = enc.render_bits(bits, width=1024, ppb=10.0,
                                       start_px=40)
    # The sweep is seeded by history/prescan coordinates in the real flow
    # (findPCM1Coordinates takes coord_history); give it an offset seed
    # within the sweep span.
    res = ld.search_coordinates(pixels[0], 110, 20, 200, 1024, fmt="pcm1",
                                history=(ds + 9, de - 11))
    assert res is not None, "sweep failed"
    assert res["words"] == list(words)
    assert res["crc"] == crc


def test_pcm1_bit_picker_recovers_cut_bits():
    words, crc, bits = _pcm1_line(3)
    # Render with the line's left edge cut: first 3 bit cells off-frame.
    pixels, (ds, de) = enc.render_bits(bits[:, 3:], width=1024, ppb=10.0,
                                       start_px=0)
    # Decoder believes data starts 3 cells left of the frame.
    ds_virtual = -30
    got_w, got_crc, calc, valid, d, s = ld.read_pcm_grid(
        ld.decode_trial_pcm1, pixels[0], ds_virtual, de, 110, 20, 200,
        1024, 0, 0)
    assert not valid  # leading bits unreadable
    fixed_w, fixed_crc, ok, pl, pr, forced = ld.pick_cut_bits_pcm1(
        got_w, got_crc, ds_virtual, de, 1024)
    assert ok and not forced
    assert pl >= 3
    assert fixed_w == list(words)


def test_pcm16x0_three_parts_decode():
    rng = np.random.default_rng(4)
    sub_words = rng.integers(0, 1 << 16, size=(3, 3))
    crcs = pcm16x0.calc_crc(sub_words, xp=np)
    line_bits = pcm16x0.line_bits(sub_words[None], crcs[None], ctrl_bit=1,
                                  xp=np)
    pixels, (ds, de) = enc.render_bits(line_bits, width=1600, ppb=7.0)
    for part in range(3):
        w, crc_read, calc, valid, d, s = ld.read_pcm_grid(
            ld.decode_trial_pcm16x0, pixels[0], ds, de, 110, 20, 200,
            1600, 0, 1, part=part)
        assert valid, f"part {part}"
        assert w == list(sub_words[part])
    assert ld.read_control_bit(pixels[0], ds, de, 110, 1600) is True


def test_pcm16x0_coordinate_sweep():
    rng = np.random.default_rng(5)
    sub_words = rng.integers(0, 1 << 16, size=(3, 3))
    crcs = pcm16x0.calc_crc(sub_words, xp=np)
    line_bits = pcm16x0.line_bits(sub_words[None], crcs[None], 0, xp=np)
    pixels, (ds, de) = enc.render_bits(line_bits, width=1600, ppb=7.0,
                                       start_px=37)
    res = ld.search_coordinates(pixels[0], 110, 20, 200, 1600,
                                fmt="pcm16x0", part=0,
                                history=(ds + 5, de - 4))
    assert res is not None
    assert res["words"] == list(sub_words[0])


def test_stc007_trial_matches_device_path():
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.ops import binarize as bz
    rng = np.random.default_rng(6)
    n = 3 * 130
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    pixels, coords, lw, crcs = enc.encode_stream(left, right, width=1152,
                                                 ppb=8.0)
    for i in (0, 10, 50):
        w, cr, calc, valid, d, s = ld.read_pcm_grid(
            ld.decode_trial_stc007, pixels[i], coords[i, 0], coords[i, 1],
            110, 20, 200, 1152, 2, 1)
        assert valid
        assert w == list(lw[i])
        assert cr == crcs[i]


def test_generic_device_decode_pcm1():
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.ops import binarize as bz
    rng = np.random.default_rng(7)
    words = rng.integers(0, 1 << 13, size=(20, 6))
    crcs = pcm1.calc_crc(words, xp=np)
    bits = pcm1.words_to_data_bits(words, crcs, xp=np)
    pixels, (ds, de) = enc.render_bits(bits, width=1024, ppb=10.0)
    w, cr, valid = bz.pcm1_frame_decode(
        jnp.asarray(pixels[None]), jnp.asarray([[ds, de]], jnp.int32),
        jnp.asarray([110], jnp.int32), jnp.asarray([20], jnp.int32),
        jnp.asarray([200], jnp.int32))
    assert bool(jnp.all(valid))
    np.testing.assert_array_equal(np.asarray(w[0]), words)
    np.testing.assert_array_equal(np.asarray(cr[0]), crcs)


def test_generic_device_decode_pcm16x0():
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.ops import binarize as bz
    rng = np.random.default_rng(8)
    sub_words = rng.integers(0, 1 << 16, size=(15, 3, 3))
    crcs = pcm16x0.calc_crc(sub_words, xp=np)
    ctrl = (rng.integers(0, 2, size=15)).astype(np.int64)
    rows = [pcm16x0.line_bits(sub_words[i:i+1], crcs[i:i+1], int(ctrl[i]),
                              xp=np)[0] for i in range(15)]
    line_bits = np.stack(rows)
    pixels, (ds, de) = enc.render_bits(line_bits, width=1600, ppb=7.0)
    w, cr, valid, cb = bz.pcm16x0_frame_decode(
        jnp.asarray(pixels[None]), jnp.asarray([[ds, de]], jnp.int32),
        jnp.asarray([110], jnp.int32), jnp.asarray([20], jnp.int32),
        jnp.asarray([200], jnp.int32))
    assert bool(jnp.all(valid))
    np.testing.assert_array_equal(np.asarray(w[0]), sub_words)
    np.testing.assert_array_equal(np.asarray(cr[0]), crcs)
    np.testing.assert_array_equal(np.asarray(cb[0]).astype(np.int64), ctrl)


def test_refine_failed_lines_jitter():
    """Per-line coordinate refinement recovers lines whose start jitters
    beyond the pixel-shift stages (findPCM1Coordinates per-line analog)."""
    import jax.numpy as jnp
    from sdvpcmdecoder_tpu.ops import binarize as bz
    from sdvpcmdecoder_tpu.ops import line_decode_np as ld
    rng = np.random.default_rng(17)
    L, W = 12, 1600
    words = rng.integers(0, 1 << 13, size=(L, 6))
    crcs = pcm1.calc_crc(words, xp=np)
    jitter = rng.choice([-14, -12, 12, 14], size=L)
    jitter[:4] = 0  # some stable lines keep the frame coords honest
    rows, starts = [], []
    for i in range(L):
        bits = pcm1.words_to_data_bits(words[i:i+1], crcs[i:i+1], xp=np)
        px, (ds, de) = enc.render_bits(bits, width=W, ppb=7.0,
                                       start_px=32 + int(jitter[i]))
        rows.append(px[0]); starts.append((ds, de))
    pixels = np.stack(rows)
    ds0, de0 = starts[0]
    w, cr, valid = bz.pcm1_frame_decode(
        jnp.asarray(pixels[None]), jnp.asarray([[ds0, de0]], jnp.int32),
        jnp.asarray([110], jnp.int32), jnp.asarray([20], jnp.int32),
        jnp.asarray([200], jnp.int32), shift_limit=2)
    v = np.asarray(valid[0])
    assert not v.all()  # jitter breaks some lines at frame coords
    fixed = ld.refine_failed_lines(pixels, v, (ds0, de0), 110, 20, 200,
                                   "pcm1", shift_limit=2, span=16)
    wl = np.asarray(w[0]).copy()
    for li, (fw, fc) in fixed.items():
        wl[li] = fw
    np.testing.assert_array_equal(wl, words)
    assert len(fixed) == int((~v).sum())


def test_pcm16x0_bit_picker():
    """Left-edge cut bits of the PART_LEFT sub-line recovered by brute
    force with the unique-solution rule; PART_RIGHT CRC LSBs re-derived."""
    rng = np.random.default_rng(33)
    sub_words = rng.integers(0, 1 << 16, size=(3, 3))
    crcs = pcm16x0.calc_crc(sub_words, xp=np)
    bits = pcm16x0.line_bits(sub_words[None], crcs[None], 0, xp=np)
    # Cut the leftmost 3 bit cells off-frame.
    pixels, _ = enc.render_bits(bits[:, 3:], width=1600, ppb=7.0,
                                start_px=0)
    ds_virtual = -21
    de = int(round(0 + 190 * 7.0))
    w, cr, calc, valid, d, s = ld.read_pcm_grid(
        ld.decode_trial_pcm16x0, pixels[0], ds_virtual, de, 110, 20, 200,
        1600, 0, 0, part=0)
    assert not valid
    fw, fc, ok, pl, pr, forced = ld.pick_cut_bits_pcm16x0(
        w, cr, ds_virtual, de, 1600, 0)
    assert ok and not forced
    assert pl >= 3
    assert fw == list(sub_words[0])
    # Right side: CRC LSBs cut; the calculated CRC fills them in.
    pixels2, _ = enc.render_bits(bits[:, :-3], width=1330, ppb=7.0,
                                 start_px=0)
    de2 = int(round(193 * 7.0))
    w2, cr2, calc2, valid2, d2, s2 = ld.read_pcm_grid(
        ld.decode_trial_pcm16x0, pixels2[0], 0, de2, 110, 20, 200,
        1330, 0, 0, part=2)
    assert not valid2
    fw2, fc2, ok2, pl2, pr2, forced2 = ld.pick_cut_bits_pcm16x0(
        w2, cr2, 0, de2, 1330, 2)
    assert ok2 and pr2 >= 3
    assert fw2 == list(sub_words[2])
    assert fc2 == int(crcs[2])
