"""Dropout-heavy robustness: noise + crop + dropouts through the full
pipeline — every emitted valid sample must be bit-exact, damage must be
flagged or masked, never silently wrong."""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import full_decoder as fd
from sdvpcmdecoder_tpu.synth import encoder as enc


def test_noisy_cropped_dropout_capture():
    lpf = 294
    n_frames = 4
    rng = np.random.default_rng(77)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               bottom_crop=4)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=2, shift_limit=1)
    for k, fr in enumerate(frames):
        pixels, coords = enc.render_lines(
            fr["line_words"], fr["crcs"], width=1152, ppb=8.0,
            noise_sigma=22.0, rng=rng)
        pixels = pixels.copy()
        if k == 1:
            pixels[200:212] = 0            # 12-line dropout
        if k == 2:
            pixels[50:55] = rng.integers(  # noise burst
                0, 255, size=(5, 1152)).astype(np.uint8)
        dec.push_frame(pixels, coords[0],
                       line_numbers=fr["line_numbers"])
    dec.finish()
    samples, rate = dec.collect()
    assert samples is not None
    el = np.asarray(stc007.expand_sample(left, xp=np))
    out_l = samples[:, 0].astype(np.int64)
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_good = 3 * (n_frames * 2 * lpf - 160)
    n_check = min(n_good, len(out_l) - st0)
    seg = out_l[st0:st0 + n_check]
    mism = float(np.mean(seg != el[:n_check]))
    # ECC + masking keep the stream nearly exact despite the damage.
    assert mism < 0.02, f"mismatch {mism}"
    # The dropout frames show corrections in the work log.
    fixes = sum(f.blocks_fix_p + f.blocks_fix_q
                for f in dec.stitcher.frame_log)
    assert fixes > 0


def test_ppb_drift_marker_recovery():
    """Tape-speed wobble: per-line PPB drifts so the shared frame
    coordinates miss some lines; the per-line marker re-search recovers
    them (the reference re-finds coordinates per line)."""
    from sdvpcmdecoder_tpu.pipeline import v2d
    rng = np.random.default_rng(91)
    L = 64
    left = rng.integers(1, 1 << 14, size=3 * L)
    right = rng.integers(1, 1 << 14, size=3 * L)
    from sdvpcmdecoder_tpu.synth import encoder as e2
    blocks = e2.samples_to_blocks(np.asarray(left), np.asarray(right))
    line_words, crcs = e2.blocks_to_lines(blocks, L)
    rows = []
    for i in range(L):
        # ppb wobbles +-1.5% line to line.
        ppb = 8.0 * (1.0 + 0.015 * np.sin(i / 3.0))
        px, _ = e2.render_lines(line_words[i:i+1], crcs[i:i+1],
                                width=1152, ppb=ppb)
        rows.append(px[0])
    pixels = np.stack(rows)
    drv = v2d.V2DDriver(hyst_limit=2, shift_limit=2)
    res = drv.decode_frame(pixels)
    assert res is not None
    # The drift must not defeat the decode: marker re-search per line
    # recovers what the shared coords miss.
    assert res.valid.all(), np.nonzero(~res.valid)[0]
    np.testing.assert_array_equal(res.words, line_words)
