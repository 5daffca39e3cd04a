"""Audio masking chain tests (modes, ramps, stray invalidation)."""
import numpy as np

from sdvpcmdecoder_tpu.pipeline import audio as ap


def _mk(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(-20000, 20000, size=(n, 2)).astype(np.int16)
    v = np.ones((n, 2), bool)
    return s, v


def test_ignore_passthrough():
    s, v = _mk()
    v[100:120, 0] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_IGNORE)
    out = proc.process(s, v)
    np.testing.assert_array_equal(out, s)


def test_mute_word():
    s, v = _mk()
    v[100:110, 0] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_MUTE_WORD)
    out = proc.process(s, v)
    assert (out[101:109, 0] == 0).all()  # interior muted
    np.testing.assert_array_equal(out[:, 1], s[:, 1])  # right untouched
    np.testing.assert_array_equal(out[:99, 0], s[:99, 0])


def test_hold_word():
    s, v = _mk()
    v[200:206, 1] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_HOLD_WORD)
    out = proc.process(s, v)
    assert (out[200:205, 1] == s[199, 1]).all()


def test_linear_interpolation_exact():
    s, v = _mk(seed=1)
    s[299, 0] = 1000
    s[310, 0] = 2100
    v[300:310, 0] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD)
    out = proc.process(s, v)
    # x16 fixed point linear ramp (audioprocessor.cpp:635-737):
    # step = round(1100*16/11)=1600; value_k = round((1000*16+1600k)/16).
    expect = [(1000 * 16 + 1600 * k + 8) // 16 for k in range(1, 11)]
    np.testing.assert_array_equal(out[300:310, 0], expect)


def test_long_dropout_ramps_to_silence():
    n = 2000
    s, v = _mk(n, seed=2)
    v[500:1000, 0] = False  # 500 > ramp_down+ramp_up
    proc = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD)
    out = proc.process(s, v)
    # Ramp anchors at good_end+193 and good_after-33 forced to zero.
    assert out[499 + ap.MAX_RAMP_DOWN + 1, 0] == 0
    assert out[1000 - ap.MAX_RAMP_UP - 1, 0] == 0
    # Middle region fully silent.
    mid = out[499 + ap.MAX_RAMP_DOWN + 2:1000 - ap.MAX_RAMP_UP - 1, 0]
    assert (mid == 0).all()
    # Ramp-down is monotone toward zero.
    ramp = out[499:499 + ap.MAX_RAMP_DOWN + 2, 0].astype(int)
    assert abs(ramp[-1]) <= abs(ramp[0])


def test_stray_islands_invalidated():
    v = np.ones(200, bool)
    v[10:40] = False     # long invalid
    v[50:90] = False     # long invalid; island 40..49 (len 10 < 28)
    out = ap.invalidate_stray_samples(v.copy())
    assert not out[40:50].any()


def test_block_mode_uses_block_flags():
    s, v = _mk()
    blk = np.ones_like(v)
    blk[400:420, :] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_MUTE_BLOCK)
    out = proc.process(s, v, block_ok=blk)
    assert (out[401:419, 0] == 0).all()
    assert (out[401:419, 1] == 0).all()


def test_eof_ramp_down():
    s, v = _mk(600, seed=3)
    v[550:, 0] = False
    proc = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD)
    out = proc.process(s, v, file_end=True)
    assert out[-1, 0] == 0
    # Monotone-ish ramp from last valid to zero.
    seg = out[549:, 0].astype(int)
    assert abs(seg[-1]) <= abs(seg[0]) or seg[0] == 0


def test_mask_channel_vectorized_matches_serial():
    """The one-pass masker == the per-region reference implementation
    over randomized dropout patterns, modes and ramps."""
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(1, 300))
        values = rng.integers(-32768, 32768, size=n)
        valid = rng.random(n) > rng.choice([0.05, 0.3, 0.9])
        mode = int(rng.choice([ap.DROP_MUTE_WORD, ap.DROP_HOLD_WORD,
                               ap.DROP_INTER_LIN_WORD]))
        fe = bool(rng.integers(0, 2))
        rd = int(rng.choice([4, 192]))
        ru = int(rng.choice([2, 32]))
        v1, g1 = values.copy(), valid.copy()
        v2, g2 = values.copy(), valid.copy()
        s1 = ap.mask_channel(v1, g1, mode, max_ramp_down=rd,
                             max_ramp_up=ru, file_end=fe)
        s2 = ap._mask_channel_serial(v2, g2, mode, max_ramp_down=rd,
                                     max_ramp_up=ru, file_end=fe)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(g1, g2)
        assert (s1.masked_samples, s1.regions) \
            == (s2.masked_samples, s2.regions)


def test_invalidate_stray_matches_serial():
    def serial(valid):
        n = len(valid)
        if n == 0:
            return valid
        inv = ~valid.copy()
        inv[0] = False
        longs = []
        rs, re = ap._runs(inv)
        for s, e in zip(rs, re):
            length = e - s + 1
            tail = e == n - 1
            if (length if not tail else length - 1) > ap.MIN_LONG_INVALID:
                longs.append((s, e, tail))
        for (s1, e1, t1), (s2, e2, t2) in zip(longs, longs[1:]):
            gap_start = 1 if t1 else e1
            delta = s2 - gap_start
            if 0 < delta < (ap.MAX_STRAY_LEN + 4):
                valid[gap_start:s2 + 1] = False
        return valid

    rng = np.random.default_rng(3)
    for trial in range(80):
        n = int(rng.integers(1, 600))
        # blocky validity patterns to hit island cases
        v = np.ones(n, bool)
        pos = 0
        while pos < n:
            run = int(rng.integers(1, 60))
            if rng.random() < 0.5:
                v[pos:pos + run] = False
            pos += run
        a = ap.invalidate_stray_samples(v.copy())
        b = serial(v.copy())
        np.testing.assert_array_equal(a, b, err_msg=str(trial))
