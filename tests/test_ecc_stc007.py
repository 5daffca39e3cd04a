"""Port of the reference's STC-007 ECC property test (pcmtester.cpp:110-371).

The reference runs 2048 randomized corruption trials through the serial
deinterleaver; here every trial is a block in ONE batched deinterleave call
(trials tiled along the line axis). Assertions follow pcmtester exactly:
  k=0 corrupted words -> valid, unfixed, not broken
  k<=2               -> corrected words equal the originals, block valid
  k>2                -> block must be flagged invalid
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.ops import deinterleave as di

# Golden line from pcmtester.cpp:119-126.
GOLD_WORDS = np.array([0x3B43, 0x3FDB, 0x3B52, 0x3FDA, 0x3B5F, 0x3FDA,
                       0x0495, 0x1DB7], dtype=np.int64)
LINES_PER_TRIAL = stc007.MIN_DEINT_DATA + 1  # 113


def _check_gold():
    # P parity must hold and Q must match (sanity of the golden vector).
    p = 0
    for w in GOLD_WORDS[:6]:
        p ^= int(w)
    assert p == GOLD_WORDS[6]


def _make_trials(rng, n_trials, kill_mode):
    """Build tiled line buffers with per-trial corruption.

    kill_mode: 'one', 'two', 'any' (pcmtester.h:45-51 KillMode).
    Returns (line_words [T*113,8], crc_ok, n_corrupt [T], masks [T,8]).
    """
    T = n_trials
    line_words = np.tile(GOLD_WORDS, (T * LINES_PER_TRIAL, 1))
    crc_ok = np.ones((T * LINES_PER_TRIAL, 8), dtype=bool)
    if kill_mode == "one":
        n_corrupt = np.ones(T, dtype=np.int64)
    elif kill_mode == "two":
        n_corrupt = np.full(T, 2, dtype=np.int64)
    else:
        n_corrupt = rng.integers(0, 9, size=T)  # rand() % WORD_CNT -> 0..8
        n_corrupt = rng.integers(0, 9, size=T) % 9
        n_corrupt = np.minimum(n_corrupt, 8)
    masks = np.zeros((T, 8), dtype=np.int64)
    for t in range(T):
        idxs = rng.permutation(8)[: n_corrupt[t]]
        for w in idxs:
            m = int(rng.integers(1, stc007.DATA_WORD_MASK + 1))
            masks[t, w] = m
            row = t * LINES_PER_TRIAL + w * stc007.INTERLEAVE_OFS
            line_words[row, w] ^= m
            crc_ok[row, w] = False
    return line_words, crc_ok, n_corrupt, masks


def _run(line_words, crc_ok, n_trials, **kw):
    shifts = jnp.arange(n_trials, dtype=jnp.int32) * LINES_PER_TRIAL
    return di.deinterleave(jnp.asarray(line_words, jnp.int32),
                           jnp.asarray(crc_ok),
                           shifts, res_mode=di.RES_MODE_14BIT, **kw)


def _assert_trials(batch, n_corrupt, masks):
    words = np.asarray(batch.words)
    valid = np.asarray(batch.valid)
    state = np.asarray(batch.audio_state)
    block_valid = valid[:, :6].all(axis=1)  # isBlockValid: audio words valid
    fixed = (state == di.AUD_FIX_P) | (state == di.AUD_FIX_Q)
    broken = state == di.AUD_BROKEN

    for t in range(len(n_corrupt)):
        k = int(n_corrupt[t])
        tag = f"trial {t} k={k} masks={masks[t]}"
        if k == 0:
            assert block_valid[t] and not fixed[t] and not broken[t], tag
            np.testing.assert_array_equal(words[t], GOLD_WORDS, tag)
        elif k <= 2:
            assert block_valid[t], tag
            corrupted = np.nonzero(masks[t])[0]
            for w in corrupted:
                assert words[t, w] == GOLD_WORDS[w], (
                    f"{tag}: word {w} {words[t, w]:#06x} != "
                    f"{GOLD_WORDS[w]:#06x}")
        else:
            assert not block_valid[t], tag


@pytest.mark.parametrize("kill_mode", ["one", "two", "any"])
def test_stc007_ecc_randomized(kill_mode):
    _check_gold()
    rng = np.random.default_rng(hash(kill_mode) % (2**31))
    n_trials = 2048
    lw, ck, n_corrupt, masks = _make_trials(rng, n_trials, kill_mode)
    batch = _run(lw, ck, n_trials)
    _assert_trials(batch, n_corrupt, masks)


def test_clean_buffer_broken_detection():
    """Forced error check flags misassembled data: all CRCs valid but parity
    violated -> BROKEN (the stitcher's key signal,
    stc007datastitcher.h:76-88)."""
    lw = np.tile(GOLD_WORDS, (LINES_PER_TRIAL, 1))
    ck = np.ones((LINES_PER_TRIAL, 8), dtype=bool)
    # Corrupt one word but leave its CRC flag "valid" (simulating a
    # misaligned-but-individually-valid line mix).
    lw[0, 0] ^= 0x0001
    batch = _run(lw, ck, 1)
    assert int(batch.audio_state[0]) == di.AUD_BROKEN
    assert not bool(batch.valid[0, :6].all())


def test_p_only_corruption_recalc():
    """Corrupt P word only -> Q route recalculates P (FIX_NOT_NEED path)."""
    lw = np.tile(GOLD_WORDS, (LINES_PER_TRIAL, 1))
    ck = np.ones((LINES_PER_TRIAL, 8), dtype=bool)
    row = 6 * stc007.INTERLEAVE_OFS
    lw[row, 6] ^= 0x1234
    ck[row, 6] = False
    batch = _run(lw, ck, 1)
    assert bool(batch.valid[0].all())
    assert int(batch.words[0, 6]) == int(GOLD_WORDS[6])
    assert int(batch.stage[0]) == di.STG_DATA_OK


def test_pq_both_corrupted_no_check():
    """P and Q both bad, audio clean -> NO_CHECK with both patched
    (stc007deinterleaver.cpp:995-1014)."""
    lw = np.tile(GOLD_WORDS, (LINES_PER_TRIAL, 1))
    ck = np.ones((LINES_PER_TRIAL, 8), dtype=bool)
    for w in (6, 7):
        row = w * stc007.INTERLEAVE_OFS
        lw[row, w] ^= 0x0F0F
        ck[row, w] = False
    batch = _run(lw, ck, 1)
    assert int(batch.stage[0]) == di.STG_NO_CHECK
    np.testing.assert_array_equal(np.asarray(batch.words[0]), GOLD_WORDS)
    assert bool(batch.valid[0].all())


def test_ecc_disabled_modes():
    """en_p=False leaves single errors unfixed (pcm parity disabled)."""
    lw = np.tile(GOLD_WORDS, (LINES_PER_TRIAL, 1))
    ck = np.ones((LINES_PER_TRIAL, 8), dtype=bool)
    lw[0, 0] ^= 0x0003
    ck[0, 0] = False
    batch = _run(lw, ck, 1, en_p=False, en_q=False)
    assert not bool(batch.valid[0, 0])
    assert int(batch.stage[0]) == di.STG_BAD_BLOCK
