"""Multi-capture batch driver test: concurrent tapes -> WAVs + stats."""
import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest, wav
from sdvpcmdecoder_tpu.synth import encoder as enc


def _make_capture(path, seed, n_frames=3, lpf=294, dropout=False):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    vids = []
    for k, fr in enumerate(frames):
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=1152, ppb=8.0)
        if dropout and k == 1:
            pixels = pixels.copy()
            pixels[100:110] = 0  # 10-line dropout
        L = pixels.shape[0]
        half = L // 2
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = pixels[:half]
        img[1::2] = pixels[half:]
        vids.append(img)
    ingest.write_y4m(path, np.stack(vids))
    return left


def test_three_concurrent_captures(tmp_path):
    jobs = []
    truths = {}
    for i in range(3):
        cap = tmp_path / f"cap{i}.y4m"
        out = tmp_path / f"cap{i}.wav"
        truths[str(cap)] = _make_capture(cap, seed=100 + i,
                                         dropout=(i == 1))
        jobs.append((str(cap), str(out)))
    dec = batch_driver.BatchDecoder(jobs, hyst_limit=1, shift_limit=1,
                                    frames_per_round=2)
    stats = dec.run()
    assert len(stats) == 3
    for i, (cap, out) in enumerate(jobs):
        s = stats[cap]
        assert s.frames_total >= 3
        samples, rate = wav.read_wav(out)
        assert rate == 44100
        el = np.asarray(stc007.expand_sample(truths[cap], xp=np))
        out_l = samples[:, 0].astype(np.int64)
        idx = np.nonzero(out_l == el[0])[0]
        assert len(idx) > 0, f"capture {i}: start not found"
        st0 = int(idx[0])
        n_good = 3 * (3 * 2 * 294 - 160)
        n_check = min(n_good, len(out_l) - st0)
        seg = out_l[st0:st0 + n_check]
        mism = float(np.mean(seg != el[:n_check]))
        assert mism < 0.01, f"capture {i}: mismatch {mism}"
        if i == 1:
            assert s.lines_valid < s.lines_total  # dropout seen
            assert s.blocks_fix_p + s.blocks_fix_q > 0  # and corrected


def test_dropped_frame_keeps_timing(tmp_path):
    """A whole black frame (no PCM) must be pushed as a dummy frame so
    the interleave timing holds: samples after the gap realign exactly."""
    rng = np.random.default_rng(55)
    n_frames, lpf = 5, 294
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    vids = []
    for k, fr in enumerate(frames):
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=1152, ppb=8.0)
        L = pixels.shape[0]
        half = L // 2
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = pixels[:half]
        img[1::2] = pixels[half:]
        if k in (0, 2):
            # k=0 exercises the no-history path (driver returns None ->
            # dummy store); k=2 the history path (all-invalid decode).
            img[:] = 0
        vids.append(img)
    cap = tmp_path / "drop.y4m"
    out = tmp_path / "drop.wav"
    ingest.write_y4m(cap, np.stack(vids))
    dec = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                    shift_limit=1, frames_per_round=2)
    stats = dec.run()
    s = stats[str(cap)]
    assert s.frames_no_pcm == 1         # frame 0 had no coords at all
    assert s.lines_total == 5 * 2 * lpf  # dummy frames still counted
    samples, _ = wav.read_wav(out)
    el = np.asarray(stc007.expand_sample(left, xp=np))
    out_l = samples[:, 0].astype(np.int64)
    # Anchor on a sample deep inside frame 2 (frames 1 and 3 are the
    # dropped ones) and verify a window there matches at some offset.
    a = 3 * (1 * 2 * lpf) + 600        # inside frame 2 (index 1)
    cand = np.nonzero(out_l == el[a])[0]
    st0 = -1
    for p in cand:
        if p + 64 <= len(out_l) and (out_l[p:p + 64] == el[a:a + 64]).all():
            st0 = int(p) - a
            break
    assert st0 >= 0, "post-gap anchor not found"
    # Samples well PAST the second dropped frame must sit at the SAME
    # stream offset: timing preserved through the gap.
    lo = 3 * (4 * 2 * lpf)              # into frame 5
    hi = 3 * (5 * 2 * lpf - 160)        # before interleave run-out
    win = out_l[st0 + lo:st0 + hi]
    match = float(np.mean(win == el[lo:lo + len(win)]))
    assert match > 0.999, match
