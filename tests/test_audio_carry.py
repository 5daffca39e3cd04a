"""Drain-boundary continuity of AudioProcessor.

The reference's 512-pair sliding buffer never splits a dropout
(audioprocessor.h:69, fixBadSamples audioprocessor.cpp:740).  The batch
AudioProcessor withholds the uncertain tail of each drain instead; the
emitted byte stream must be INVARIANT to how the sample stream is cut
into process() calls — including dropouts that span several drains.
"""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import audio as ap


def _stream(seed=0, n=6000, p_drop=0.02, burst=400):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-30000, 30000, (n, 2)).astype(np.int16)
    valid = np.ones((n, 2), bool)
    # scatter short dropouts
    for ch in range(2):
        k = rng.integers(0, n, int(n * p_drop))
        valid[k, ch] = False
    # a few long bursts (ramp-down/mute/ramp-up paths)
    for ch in range(2):
        for _ in range(3):
            s = int(rng.integers(0, n - burst))
            valid[s:s + burst, ch] = False
    block = np.ones((n, 2), bool)
    return samples, valid, block


def _run_chunked(samples, valid, block, mode, sizes):
    proc = ap.AudioProcessor(mask_mode=mode)
    outs = []
    pos = 0
    i = 0
    n = len(samples)
    while pos < n:
        c = sizes[i % len(sizes)]
        i += 1
        end = min(pos + c, n)
        outs.append(proc.process(samples[pos:end], valid[pos:end],
                                 block[pos:end], file_end=False))
        pos = end
    outs.append(proc.process(samples[:0], valid[:0], block[:0],
                             file_end=True))
    return np.concatenate(outs), proc.total_masked


MODES = [ap.DROP_MUTE_WORD, ap.DROP_HOLD_WORD, ap.DROP_INTER_LIN_WORD,
         ap.DROP_MUTE_BLOCK, ap.DROP_INTER_LIN_BLOCK]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("sizes", [(512,), (100,), (37, 911, 4),
                                   (1, 4999)])
def test_chunk_invariance(mode, sizes):
    samples, valid, block = _stream()
    ref_proc = ap.AudioProcessor(mask_mode=mode)
    ref = ref_proc.process(samples, valid, block, file_end=True)
    got, masked = _run_chunked(samples, valid, block, mode, sizes)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
    assert masked == ref_proc.total_masked


def test_dropout_straddles_drain_boundary():
    """A dropout crossing the drain boundary must come out as ONE
    interpolated region — not raw garbage + mute (the round-2 failure
    mode: mask_channel dropped the trailing run, then the next call
    muted its continuation as a leading run)."""
    n = 1000
    samples = np.full((n, 2), 10000, np.int16)
    valid = np.ones((n, 2), bool)
    samples[480:520] = 31000          # garbage inside the dropout
    valid[480:520] = False
    samples[519] = -10000             # hmm: invalid, value irrelevant
    samples[520:] = -10000            # right anchor level
    block = np.ones((n, 2), bool)
    ref = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD).process(
        samples, valid, block, file_end=True)
    got, _ = _run_chunked(samples, valid, block, ap.DROP_INTER_LIN_WORD,
                          (500,))   # boundary at sample 500, mid-dropout
    assert np.array_equal(got, ref)
    # the masked span must actually interpolate (monotone ramp), no
    # 31000 garbage and no hard mute-to-zero plateau
    ch = ref[480:520, 0].astype(int)
    assert ch.max() < 31000 and (np.diff(ch) <= 0).all()


def test_dropout_spanning_many_drains():
    """A 1500-sample dropout cut into 100-sample drains: emitted bytes
    equal the single-shot result (carry grows until the right anchor
    shows up)."""
    n = 4000
    rng = np.random.default_rng(3)
    samples = rng.integers(-1000, 1000, (n, 2)).astype(np.int16)
    valid = np.ones((n, 2), bool)
    valid[1000:2500] = False
    block = np.ones((n, 2), bool)
    ref = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD).process(
        samples, valid, block, file_end=True)
    got, _ = _run_chunked(samples, valid, block, ap.DROP_INTER_LIN_WORD,
                          (100,))
    assert np.array_equal(got, ref)


def test_stray_island_across_boundary():
    """A short valid island between two long dropouts, with the drain
    boundary inside the island: stray invalidation must still merge the
    region exactly as single-shot (the island is uncertain until the
    second long run arrives)."""
    n = 800
    samples = np.full((n, 2), 5000, np.int16)
    valid = np.ones((n, 2), bool)
    valid[300:400] = False            # long run 1
    samples[400:415] = 29000          # stray island (len 15 < 27)
    valid[415:520] = False            # long run 2
    block = np.ones((n, 2), bool)
    ref = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD).process(
        samples, valid, block, file_end=True)
    for cutpos in (405, 410, 414):
        got, _ = _run_chunked(samples, valid, block,
                              ap.DROP_INTER_LIN_WORD, (cutpos, n))
        assert np.array_equal(got, ref), cutpos


def test_carry_state_roundtrip():
    """carry_state/set_carry_state reproduce the stream exactly — the
    checkpoint/resume contract for a kill mid-dropout."""
    samples, valid, block = _stream(seed=5)
    mode = ap.DROP_INTER_LIN_WORD
    ref = ap.AudioProcessor(mask_mode=mode).process(
        samples, valid, block, file_end=True)
    proc1 = ap.AudioProcessor(mask_mode=mode)
    out1 = proc1.process(samples[:3100], valid[:3100], block[:3100],
                         file_end=False)
    state = proc1.carry_state()
    masked1 = proc1.total_masked
    proc2 = ap.AudioProcessor(mask_mode=mode)   # "restarted process"
    proc2.set_carry_state(state)
    proc2.total_masked = masked1
    out2 = proc2.process(samples[3100:], valid[3100:], block[3100:],
                         file_end=True)
    got = np.concatenate([out1, out2])
    assert np.array_equal(got, ref)
