"""Ingest (Y4M native + python), field splitting, V2D driver, CLI."""
import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import ingest, v2d
from sdvpcmdecoder_tpu.synth import encoder as enc
from sdvpcmdecoder_tpu.formats import stc007


def _synth_capture(tmp_path, n_frames=3, lpf=294, width=1152, crop=0,
                   seed=0, chroma="mono"):
    rng = np.random.default_rng(seed)
    n = 3 * n_frames * 2 * lpf
    left = rng.integers(1, 1 << 14, size=n)
    right = rng.integers(1, 1 << 14, size=n)
    frames = enc.encode_fields(left, right, n_frames, lines_pf=lpf,
                               bottom_crop=crop)
    vids = []
    for fr in frames:
        pixels, coords = enc.render_lines(fr["line_words"], fr["crcs"],
                                          width=width, ppb=8.0)
        # Interlace back into a video frame: field-sequential -> rows.
        L = pixels.shape[0]
        half = L // 2
        H = L
        img = np.zeros((H, width), np.uint8)
        img[0::2] = pixels[:half]
        img[1::2] = pixels[half:]
        vids.append(img)
    path = tmp_path / "cap.y4m"
    ingest.write_y4m(path, np.stack(vids), chroma=chroma)
    return path, left, right


@pytest.mark.parametrize("chroma", ["mono", "420jpeg"])
def test_y4m_roundtrip(tmp_path, chroma):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(4, 32, 64)).astype(np.uint8)
    path = tmp_path / "t.y4m"
    ingest.write_y4m(path, frames, chroma=chroma)
    with ingest.VideoReader(path) as rd:
        assert (rd.width, rd.height, rd.n_frames) == (64, 32, 4)
        got = rd.read_frames(0, 4)
        np.testing.assert_array_equal(got, frames)
        # Partial read
        np.testing.assert_array_equal(rd.read_frames(2, 5), frames[2:])


def test_y4m_python_fallback(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(3, 16, 32)).astype(np.uint8)
    path = tmp_path / "t.y4m"
    ingest.write_y4m(path, frames)
    with ingest.VideoReader(path, use_native=False) as rd:
        np.testing.assert_array_equal(rd.read_frames(0, 3), frames)


def test_split_fields():
    frame = np.arange(8 * 4, dtype=np.uint8).reshape(8, 4) * 0 \
        + np.arange(8, dtype=np.uint8)[:, None]
    lines, nums = ingest.split_fields(frame, double_narrow=False)
    np.testing.assert_array_equal(lines[:, 0], [0, 2, 4, 6, 1, 3, 5, 7])
    np.testing.assert_array_equal(nums, [1, 3, 5, 7, 2, 4, 6, 8])


def test_split_fields_doubles_narrow():
    frame = np.zeros((4, 720), np.uint8)
    lines, _ = ingest.split_fields(frame)
    assert lines.shape[1] == 1440


def test_v2d_decodes_frame(tmp_path):
    path, left, right = _synth_capture(tmp_path, n_frames=1)
    with ingest.VideoReader(path) as rd:
        frame = rd.read_frames(0, 1)[0]
    lines, nums = ingest.split_fields(frame)
    driver = v2d.V2DDriver(hyst_limit=1, shift_limit=1)
    res = driver.decode_frame(lines)
    assert res is not None
    assert res.valid.all()
    # Prescan coordinates close to analytic render coords (40, 1096).
    assert abs(res.coords[0] - 40) <= 2
    assert abs(res.coords[1] - 1096) <= 2


def test_cli_end_to_end(tmp_path, capsys):
    from sdvpcmdecoder_tpu.__main__ import main
    from sdvpcmdecoder_tpu.pipeline import wav
    path, left, right = _synth_capture(tmp_path, n_frames=3, seed=7)
    out = tmp_path / "out.wav"
    rc = main([str(path), "-o", str(out), "--quality", "fast",
               "--standard", "pal"])
    assert rc == 0
    samples, rate = wav.read_wav(out)
    assert rate == 44100
    el = np.asarray(stc007.expand_sample(left, xp=np))
    out_l = samples[:, 0].astype(np.int64)
    idx = np.nonzero(out_l == el[0])[0]
    assert len(idx) > 0
    st0 = int(idx[0])
    n_good = 3 * (3 * 2 * 294 - 144)
    n_check = min(n_good, len(out_l) - st0)
    np.testing.assert_array_equal(out_l[st0:st0 + n_check], el[:n_check])
