"""Dropped-frame detection via the `.pts` timeline sidecar: a capture
with a physically REMOVED frame still decodes downstream blocks bit-exact
after the gap (dummy-frame insertion keeps the interleave phase, the
reference's vin_ffmpeg.cpp:367-523)."""
import json

import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest, wav
from sdvpcmdecoder_tpu.synth import encoder as enc


def _frames(n_frames=6, lpf=294, seed=21):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, n)
    right = rng.integers(1, 1 << 14, n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf)
    vids = []
    for fr in frames:
        pixels, _ = enc.render_lines(fr["line_words"], fr["crcs"],
                                     width=1152, ppb=8.0)
        L = pixels.shape[0]
        img = np.zeros((L, 1152), np.uint8)
        img[0::2] = pixels[:L // 2]
        img[1::2] = pixels[L // 2:]
        vids.append(img)
    return np.stack(vids), left


def test_timeline_reader_inserts_black_frames(tmp_path):
    vids, _ = _frames()
    drop = 2
    kept = np.delete(vids, drop, axis=0)
    cap = tmp_path / "c.y4m"
    ingest.write_y4m(cap, kept)
    timeline = [i for i in range(len(vids)) if i != drop]
    (tmp_path / "c.y4m.pts").write_text(json.dumps(timeline))
    with ingest.VideoReader(cap) as rd:
        assert rd.n_frames == len(vids)
        assert rd.dropped_frames == 1
        batch = rd.read_frames(0, len(vids))
        assert (batch[drop] == 0).all()
        np.testing.assert_array_equal(batch[drop + 1], vids[drop + 1])
        np.testing.assert_array_equal(batch[:drop], vids[:drop])


def test_removed_frame_decodes_bit_exact_after_gap(tmp_path):
    vids, left = _frames()
    drop = 2
    kept = np.delete(vids, drop, axis=0)
    cap = tmp_path / "c.y4m"
    out = tmp_path / "c.wav"
    ingest.write_y4m(cap, kept)
    (tmp_path / "c.y4m.pts").write_text(json.dumps(
        {"timeline": [i for i in range(len(vids)) if i != drop]}))
    dec = batch_driver.BatchDecoder([(str(cap), str(out))], hyst_limit=1,
                                    shift_limit=1, frames_per_round=2)
    stats = dec.run()
    s = stats[str(cap)]
    # The gap becomes one frame of all-invalid lines (equivalently a
    # no-PCM dummy, depending on whether coordinate history existed).
    assert s.frames_no_pcm == 1 or \
        s.lines_total - s.lines_valid >= 2 * 294
    samples, rate = wav.read_wav(out)
    el = np.asarray(stc007.expand_sample(left, xp=np)).astype(np.int64)
    out_l = samples[:, 0].astype(np.int64)
    lpf = 294
    # Pre-gap anchor, run-verified (single-value hits can be spurious).
    a = 3 * lpf  # inside frame 0
    st0 = -1
    for p in np.nonzero(out_l == el[a])[0]:
        if p + 64 <= len(out_l) \
                and (out_l[p:p + 64] == el[a:a + 64]).all():
            st0 = int(p) - a
            break
    assert st0 >= 0, "pre-gap anchor not found"
    # Samples well past the gap must sit at the SAME stream offset:
    # interleave timing preserved through the removed frame.
    lo = (drop + 2) * 2 * lpf * 3
    hi = 5 * 2 * lpf * 3
    win = out_l[st0 + lo:st0 + hi]
    match = float(np.mean(win == el[lo:lo + len(win)]))
    assert match > 0.999, match


def test_sidecar_length_mismatch_rejected(tmp_path):
    vids, _ = _frames(n_frames=3)
    cap = tmp_path / "c.y4m"
    ingest.write_y4m(cap, vids)
    (tmp_path / "c.y4m.pts").write_text(json.dumps([0, 1]))
    import pytest
    with pytest.raises(AssertionError):
        ingest.VideoReader(cap)
