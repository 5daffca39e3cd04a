"""ArVid Audio prototype pipeline (pipeline/arvid_pipe.py).

The reference's ArVid surface is debug-only binarize + word dump
(videotodigital.cpp:857, binarizer.cpp:7448 fillArVidAudio); the
pipeline here must round-trip rendered words exactly."""
import numpy as np

from sdvpcmdecoder_tpu.formats import arvid
from sdvpcmdecoder_tpu.ops import line_decode_np as ld
from sdvpcmdecoder_tpu.pipeline import arvid_pipe, ingest
from sdvpcmdecoder_tpu.synth import encoder as enc


def _render_frames(rng, F=2, L=64, W=1024):
    """Render random 18x8-bit word rows as ArVid data lines; returns
    (words, frames, data coords)."""
    words = rng.integers(0, 256, size=(F, L, arvid.WORD_CNT))
    frames = np.zeros((F, L, W), np.uint8) + 20
    coords = (0, W - 1)
    for f in range(F):
        bits = arvid.words_to_data_bits(words[f], xp=np)
        px, coords = enc.render_bits(bits, width=W, ppb=5.5)
        frames[f] = px
    return words, frames, coords


def test_decode_roundtrip():
    rng = np.random.default_rng(12)
    words, frames, coords = _render_frames(rng)
    got, refs = arvid_pipe.decode_frames(frames, coords=coords)
    np.testing.assert_array_equal(got.astype(np.int64), words)
    assert (refs > 0).all()


def test_decode_matches_serial_reference():
    """The batch decode must equal per-line decode_trial_arvid."""
    rng = np.random.default_rng(13)
    words, frames, coords = _render_frames(rng, F=1, L=8)
    got, refs = arvid_pipe.decode_frames(frames, coords=coords)
    W = frames.shape[2]
    for li in range(8):
        ser, _, _, _ = ld.decode_trial_arvid(
            frames[0, li], coords[0], coords[1], int(refs[0]), 0, 0, W)
        np.testing.assert_array_equal(got[0, li].astype(int),
                                      np.asarray(ser[:18]))


def test_dump_format():
    w = np.arange(18, dtype=np.uint8)[None, :].repeat(2, axis=0)
    lines = arvid_pipe.dump_words_lines(w, 7)
    assert lines[0].startswith("F[00007] L[000] 00 01 02")
    assert len(lines) == 2


def test_cli_arvid_dump(tmp_path):
    from sdvpcmdecoder_tpu.__main__ import main
    rng = np.random.default_rng(14)
    words, frames, coords = _render_frames(rng, F=2, L=64, W=1024)
    # interlace field-sequential lines into frame rows for the capture
    vids = []
    for f in range(2):
        img = np.zeros_like(frames[f])
        img[0::2] = frames[f][:32]
        img[1::2] = frames[f][32:]
        vids.append(img)
    cap = tmp_path / "ar.y4m"
    out = tmp_path / "ar.txt"
    ingest.write_y4m(cap, np.stack(vids), chroma="mono")
    rc = main([str(cap), "-o", str(out), "--format", "arvid",
               "--force-coords", f"{coords[0]}:{coords[1]}"])
    assert rc == 0
    text = out.read_text().strip().splitlines()
    assert len(text) == 2 * 64
    raw = np.frombuffer((tmp_path / "ar.bin").read_bytes(), np.uint8)
    np.testing.assert_array_equal(
        raw.reshape(2, 64, 18).astype(np.int64), words)
