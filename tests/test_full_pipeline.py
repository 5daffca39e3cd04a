"""Whole-chain test: pixels -> binarizer -> stitcher -> audio -> WAV."""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import full_decoder as fd
from sdvpcmdecoder_tpu.pipeline import wav
from sdvpcmdecoder_tpu.synth import encoder as enc


def _render_frames(frames, width=1152, ppb=8.0):
    out = []
    for fr in frames:
        pixels, coords = enc.render_lines(fr["line_words"], fr["crcs"],
                                          width=width, ppb=ppb)
        out.append((pixels, coords[0], fr["line_numbers"]))
    return out


def test_pixels_to_wav_with_crop(tmp_path):
    lpf = 294
    n_frames = 3
    rng = np.random.default_rng(20)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               bottom_crop=5)
    rendered = _render_frames(frames)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=1, shift_limit=1)
    for pixels, coords, line_numbers in rendered:
        dec.push_frame(pixels, coords, line_numbers=line_numbers)
    dec.finish()
    samples, rate = dec.collect()
    assert samples is not None
    assert rate == fd.st.SAMPLE_RATE_44100  # PAL
    # Paddings of 5 detected on middle frames.
    mids = dec.stitcher.frame_log[1:-1]
    assert all(fr.inner_padding == 5 for fr in mids), \
        [(fr.inner_padding, fr.outer_padding) for fr in mids]
    # Ground truth alignment.
    el = np.asarray(stc007.expand_sample(left, xp=np))
    out_l = samples[:, 0].astype(np.int64)
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_good = 3 * (n_frames * 2 * lpf - stc007.MIN_DEINT_DATA - 32)
    n_check = min(n_good, len(out_l) - st0)
    seg = out_l[st0:st0 + n_check]
    # With interpolation masking output should be mostly exact; count
    # mismatches (masked samples around the cropped lines).
    mism = np.mean(seg != el[:n_check])
    assert mism < 0.05, f"mismatch rate {mism}"
    # WAV write round-trip.
    p = tmp_path / "full.wav"
    wav.write_wav(p, samples, rate)
    back, r2 = wav.read_wav(p)
    assert r2 == rate and len(back) == len(samples)


def test_pixels_to_wav_clean_bit_exact(tmp_path):
    lpf = 294
    n_frames = 3
    rng = np.random.default_rng(21)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    rendered = _render_frames(frames)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=1, shift_limit=1)
    for pixels, coords, line_numbers in rendered:
        dec.push_frame(pixels, coords, line_numbers=line_numbers)
    dec.finish()
    samples, rate = dec.collect()
    el = np.asarray(stc007.expand_sample(left, xp=np))
    er = np.asarray(stc007.expand_sample(right, xp=np))
    out_l = samples[:, 0].astype(np.int64)
    out_r = samples[:, 1].astype(np.int64)
    idx = np.nonzero(out_l == el[0])[0]
    st0 = int(idx[0])
    n_good = 3 * (n_frames * 2 * lpf - stc007.MIN_DEINT_DATA - 32)
    n_check = min(n_good, len(out_l) - st0)
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], el[:n_check])
    np.testing.assert_array_equal(out_r[st0:st0 + n_check], er[:n_check])


def test_ntsc_16bit_end_to_end():
    """NTSC geometry + 16-bit PCM-F1 resolution, auto-detected: the full
    pixels->WAV chain stays bit-exact with the S-word LSB extension."""
    lpf = 245
    n_frames = 4
    rng = np.random.default_rng(88)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(0, 1 << 16, size=n)
    right = rng.integers(0, 1 << 16, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               resolution=16)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=1, shift_limit=1)
    for fr in frames:
        pixels, coords = enc.render_lines(fr["line_words"], fr["crcs"],
                                          width=1152, ppb=8.0)
        dec.push_frame(pixels, coords[0], line_numbers=fr["line_numbers"])
    dec.finish()
    samples, rate = dec.collect()
    assert samples is not None
    exp = np.where(left >= 0x8000, left - 0x10000, left).astype(np.int64)
    out_l = samples[:, 0].astype(np.int64)
    idx = np.nonzero(out_l == exp[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_check = min(3 * (n_frames * 2 * lpf - 160), len(out_l) - st0)
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], exp[:n_check])
    # The stitcher must have auto-detected 16-bit resolution.
    from sdvpcmdecoder_tpu.ops import deinterleave as di
    assert any(f.odd_resolution in (di.RES_MODE_16BIT,
                                    di.RES_MODE_16BIT_AUTO)
               for f in dec.stitcher.frame_log)


def test_m2_end_to_end():
    """M2 companding: same tape layout, different sample expansion."""
    lpf = 294
    rng = np.random.default_rng(89)
    n = 3 * 2 * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, 2, lines_pf=lpf)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=1, shift_limit=1,
                         m2=True)
    for fr in frames:
        pixels, coords = enc.render_lines(fr["line_words"], fr["crcs"],
                                          width=1152, ppb=8.0)
        dec.push_frame(pixels, coords[0], line_numbers=fr["line_numbers"])
    dec.finish()
    samples, rate = dec.collect()
    exp = np.asarray(stc007.expand_sample(left, m2=True, xp=np)) \
        .astype(np.int64)
    out_l = samples[:, 0].astype(np.int64)
    idx = np.nonzero(out_l == exp[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_check = min(3 * (2 * 2 * lpf - 160), len(out_l) - st0)
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], exp[:n_check])
