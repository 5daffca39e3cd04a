"""Core decoder promise under randomized damage: a sample flagged VALID
is always bit-exact; damage may only mask or invalidate, never corrupt
silently."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import full_decoder as fd
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.synth import encoder as enc


def _damage(pixels, rng, scenario):
    px = pixels.copy()
    L, W = px.shape
    if scenario == 0:      # line dropouts
        rows = rng.choice(L, size=L // 20, replace=False)
        px[rows] = 0
    elif scenario == 1:    # heavy gaussian noise
        px = np.clip(px.astype(np.float64)
                     + rng.normal(0, 30, px.shape), 0, 255).astype(np.uint8)
    elif scenario == 2:    # burst: contiguous band wiped
        a = rng.integers(0, L - 40)
        px[a:a + 40] = rng.integers(0, 255, size=(40, W)).astype(np.uint8)
    elif scenario == 3:    # vertical tear: columns zeroed
        c = rng.integers(100, W - 200)
        px[:, c:c + 60] = 0
    return px


@pytest.mark.parametrize("scenario", [0, 1, 2, 3])
def test_valid_samples_always_exact(scenario):
    lpf = 294
    n_frames = 3
    rng = np.random.default_rng(1000 + scenario)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    dec = fd.FullDecoder(lines_per_field=lpf, hyst_limit=2, shift_limit=1)
    for fr in frames:
        pixels, coords = enc.render_lines(fr["line_words"], fr["crcs"],
                                          width=1152, ppb=8.0)
        dec.push_frame(_damage(pixels, rng, scenario), coords[0],
                       line_numbers=fr["line_numbers"])
    dec.finish()
    # Inspect the raw stitcher output (pre-masking): flags vs truth.
    chunks = dec.stitcher.pop_sample_chunks()
    data = [c for c in chunks if c.service == st.SRV_NO and len(c.block_ok)]
    assert data, "no output"
    out = np.concatenate([c.samples for c in data]).astype(np.int64)
    valid = np.concatenate([c.valid for c in data])
    block_ok = np.concatenate([np.repeat(c.block_ok[:, None], 2, axis=1)
                               for c in data])
    el = np.asarray(stc007.expand_sample(left, xp=np)).astype(np.int64)
    er = np.asarray(stc007.expand_sample(right, xp=np)).astype(np.int64)
    # Anchor the stream (initial run-in may be silence and some early
    # samples may be destroyed by the damage): try successive anchors
    # and confirm with a 16-sample window.
    st0 = -1
    for k in range(0, 300):
        for p in np.nonzero(out[:, 0] == el[k])[0]:
            if p - k < 0 or p + 16 > len(out):
                continue
            if (out[p:p + 16, 0] == el[k:k + 16]).all():
                st0 = int(p) - k
                break
        if st0 >= 0:
            break
    assert st0 >= 0, "stream anchor not found"
    n_cmp = min(len(out) - st0, len(el))
    o = out[st0:st0 + n_cmp]
    v = valid[st0:st0 + n_cmp]
    bo = block_ok[st0:st0 + n_cmp]
    exact_l = o[:, 0] == el[:n_cmp]
    exact_r = o[:, 1] == er[:n_cmp]
    # THE invariant: (valid & block_ok) => exact. Raw line-CRC collisions
    # can make an isolated word_valid flag lie (the reference documents
    # up to 20 colliding 'valid' CRCs per line, binarizer.h:114-116);
    # the block consistency check is the guard, so block-confirmed
    # samples must NEVER be wrong.
    bad_l = int((v[:, 0] & bo[:, 0] & ~exact_l).sum())
    bad_r = int((v[:, 1] & bo[:, 1] & ~exact_r).sum())
    assert bad_l == 0, f"scenario {scenario}: {bad_l} lying left flags"
    assert bad_r == 0, f"scenario {scenario}: {bad_r} lying right flags"
    lying_words = int((v[:, 0] & ~exact_l).sum() + (v[:, 1] & ~exact_r)
                      .sum())
    if scenario < 3:
        # Word-level collisions are absent under recoverable damage and
        # the decoder recovers the vast majority of samples.
        assert lying_words == 0, f"scenario {scenario}: {lying_words}"
        assert v[:, 0].mean() > 0.85, f"valid rate {v[:, 0].mean()}"
    else:
        # The tear can land on the CRC columns, destroying ~every line:
        # nothing is recoverable (same for the reference), but raw
        # word-level CRC collisions stay bounded in absolute terms.
        assert lying_words < 0.01 * 2 * n_cmp, lying_words
