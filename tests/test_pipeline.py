"""End-to-end vertical slice: synth encode -> decode -> WAV roundtrip."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.synth import encoder as enc
from sdvpcmdecoder_tpu.pipeline import decoder, wav


def test_end_to_end_clean_stream(tmp_path):
    rng = np.random.default_rng(10)
    n = 3 * 50
    left = rng.integers(0, 1 << 14, size=n)
    right = rng.integers(0, 1 << 14, size=n)
    pixels, coords, *_ = enc.encode_stream(left, right, width=1152, ppb=8.0)
    samples, svalid, line_valid, state = decoder.decode_to_numpy(
        pixels, coords, hyst_limit=1, shift_limit=1)
    assert line_valid.all()
    assert svalid.all()
    # Expand expected samples like the reference (14 -> 16 bit <<2).
    from sdvpcmdecoder_tpu.formats import stc007
    exp_l = np.asarray(stc007.expand_sample(left, xp=np))
    exp_r = np.asarray(stc007.expand_sample(right, xp=np))
    np.testing.assert_array_equal(samples[:n, 0], exp_l)
    np.testing.assert_array_equal(samples[:n, 1], exp_r)
    # WAV roundtrip, 44.056 kHz (PAL STC-007).
    path = tmp_path / "out.wav"
    wav.write_wav(path, samples[:n], sample_rate=44056)
    back, rate = wav.read_wav(path)
    assert rate == 44056
    np.testing.assert_array_equal(back, samples[:n])


def test_wav_header_patch_on_flush(tmp_path):
    path = tmp_path / "stream.wav"
    w = wav.WavWriter(path, 44100)
    w.write(np.zeros((100, 2), np.int16))
    w.flush()
    back, rate = wav.read_wav(path)
    assert back.shape == (100, 2)
    w.write(np.ones((50, 2), np.int16))
    w.close()
    back, _ = wav.read_wav(path)
    assert back.shape == (150, 2)
    assert (back[100:] == 1).all()


def test_end_to_end_with_dropout(tmp_path):
    """Corrupt a run of lines; ECC + CRC flags must cover the damage."""
    rng = np.random.default_rng(11)
    n = 3 * 80
    left = rng.integers(0, 1 << 14, size=n)
    right = rng.integers(0, 1 << 14, size=n)
    pixels, coords, line_words, _ = enc.encode_stream(
        left, right, width=1152, ppb=8.0)
    # Dropout: wipe 8 consecutive lines in the middle of the stream.
    pixels = pixels.copy()
    pixels[60:68, :] = 0
    samples, svalid, line_valid, state = decoder.decode_to_numpy(
        pixels, coords, hyst_limit=1, shift_limit=1)
    assert not line_valid[60:68].any()
    # <= 2 wiped taps per block -> ECC fixes; verify every valid sample
    # matches the ground truth.
    from sdvpcmdecoder_tpu.formats import stc007
    exp_l = np.asarray(stc007.expand_sample(left, xp=np))
    exp_r = np.asarray(stc007.expand_sample(right, xp=np))
    lv = svalid[:n, 0]
    rv = svalid[:n, 1]
    np.testing.assert_array_equal(samples[:n, 0][lv], exp_l[lv])
    np.testing.assert_array_equal(samples[:n, 1][rv], exp_r[rv])
    # 8 consecutive lines hit at most 1 tap per block (interleave 16):
    # everything must be corrected, nothing masked.
    assert svalid[:n].all()
    assert (state == 0).sum() < len(state)  # some blocks were P/Q-fixed
