"""Explicit contract of the external-FFmpeg transcode fallback
(ingest.transcode_with_ffmpeg): a fake `ffmpeg` executable on disk
drives the REAL code path — showinfo PTS harvesting, drop detection by
PTS deltas, `.pts` sidecar emission — and the reader re-inserts dummy
frames at the detected gaps so decode timing survives (the reference's
DTS drop check + insertDummyFrame, ffmpegwrapper.h:172-174,
vin_ffmpeg.cpp:367)."""
import os
import stat
import sys

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import ingest


def _fake_ffmpeg(tmp_path, y4m_path, pts_times):
    """An executable that mimics the two ffmpeg invocations the
    transcode helper makes: `-f null` prints showinfo pts_time lines to
    stderr; the transcode form copies the prepared Y4M to the last
    argument."""
    script = tmp_path / "ffmpeg"
    lines = "\\n".join(
        f"[Parsed_showinfo ...] n: {i} pts_time:{t:.6f} duration..."
        for i, t in enumerate(pts_times))
    script.write_text(f"""#!{sys.executable}
import shutil, sys
args = sys.argv[1:]
if "null" in args:
    sys.stderr.write("{lines}".replace("\\\\n", chr(10)))
    sys.exit(0)
shutil.copy({str(y4m_path)!r}, args[-1])
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


def _write_y4m(path, n_frames, H=16, W=24, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n_frames, H, W)).astype(np.uint8)
    ingest.write_y4m(str(path), frames, chroma="mono")
    return frames


def test_transcode_detects_drops_and_writes_sidecar(tmp_path):
    # 5 stored frames at 25 fps with TWO frames missing between
    # stored #2 and #3 (pts jumps 0.08 -> 0.20).
    y4m = tmp_path / "stored.y4m"
    frames = _write_y4m(y4m, 5)
    ff = _fake_ffmpeg(tmp_path, y4m,
                      [0.00, 0.04, 0.08, 0.20, 0.24])
    dst = tmp_path / "out.y4m"
    drops = ingest.transcode_with_ffmpeg(tmp_path / "cap.avi", dst,
                                         ffmpeg=ff)
    assert drops == 2
    assert (tmp_path / "out.y4m.pts").exists()
    # The reader spans the full timeline: 5 stored + 2 reinserted.
    with ingest.open_capture(str(dst)) as rd:
        assert rd.n_frames == 7
        assert rd.dropped_frames == 2
        got = rd.read_frames(0, 7)
    np.testing.assert_array_equal(got[0], frames[0])
    np.testing.assert_array_equal(got[2], frames[2])
    np.testing.assert_array_equal(got[5], frames[3])
    np.testing.assert_array_equal(got[6], frames[4])


def test_transcode_no_drops_no_sidecar(tmp_path):
    y4m = tmp_path / "stored.y4m"
    _write_y4m(y4m, 4, seed=1)
    ff = _fake_ffmpeg(tmp_path, y4m, [0.00, 0.04, 0.08, 0.12])
    dst = tmp_path / "out.y4m"
    drops = ingest.transcode_with_ffmpeg(tmp_path / "cap.mkv", dst,
                                         ffmpeg=ff)
    assert drops == 0
    assert not (tmp_path / "out.y4m.pts").exists()


def test_transcode_missing_binary_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ingest.transcode_with_ffmpeg(
            tmp_path / "cap.avi", tmp_path / "o.y4m",
            ffmpeg=str(tmp_path / "nope-ffmpeg"))


def test_transcode_duplicate_pts_collapse(tmp_path):
    """Duplicate PTS (VFR stutter) must not create phantom drops: the
    monotonic guard collapses them to +1 steps."""
    y4m = tmp_path / "stored.y4m"
    _write_y4m(y4m, 5, seed=2)
    ff = _fake_ffmpeg(tmp_path, y4m, [0.00, 0.04, 0.04, 0.08, 0.12])
    dst = tmp_path / "out.y4m"
    drops = ingest.transcode_with_ffmpeg(tmp_path / "cap.avi", dst,
                                         ffmpeg=ff)
    assert drops == 0


def test_transcoded_capture_decodes_with_gap_dummies(tmp_path):
    """End to end: a transcoded capture with a drop decodes through the
    batch driver; the reinserted dummy keeps frame count/timing."""
    from test_device_driver import _write_capture
    from sdvpcmdecoder_tpu.pipeline import batch_driver
    tmp = str(tmp_path)
    src = _write_capture(tmp, "c", 5, 294, seed=6)
    ff = _fake_ffmpeg(tmp_path, src, [0.00, 0.04, 0.08, 0.16, 0.20])
    dst = tmp_path / "cap.y4m"
    drops = ingest.transcode_with_ffmpeg(tmp_path / "cap.avi", dst,
                                         ffmpeg=ff)
    assert drops == 1
    out = os.path.join(tmp, "o.wav")
    dec = batch_driver.BatchDecoder([(str(dst), out)],
                                    lines_per_field=294, hyst_limit=1,
                                    shift_limit=1, backend="native")
    stats = dec.run()
    s = list(stats.values())[0]
    assert s.frames_total == 6          # 5 stored + 1 dummy
    assert s.frames_dropped == 1
    assert os.path.getsize(out) > 44
