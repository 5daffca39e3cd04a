"""V4L2 mmap-streaming capture (capture.V4L2Reader): the REQBUFS/QBUF/
STREAMON state machine against a mocked ioctl surface, format
negotiation (GREY refused -> YUYV), sequence-gap dummy insertion, and
decode equality of reader-fed frames vs the file path."""
import ctypes
import os

import numpy as np
import pytest

from sdvpcmdecoder_tpu.pipeline import capture as cap


class FakeMMap:
    def __init__(self, length):
        self.buf = bytearray(length)
        self._pos = 0
        self.closed = False

    def seek(self, pos):
        self._pos = pos

    def read(self, n):
        out = bytes(self.buf[self._pos:self._pos + n])
        self._pos += n
        return out

    def __len__(self):
        return len(self.buf)

    def close(self):
        self.closed = True


class FakeV4L2IO:
    """Simulates a UVC-ish device: YUYV only, 4 mmap buffers, frames
    served from a list, optional sequence gaps (dropped frames)."""

    def __init__(self, frames, drop_after=None, drop_n=0,
                 grey_ok=False, adjust=None):
        self.frames = list(frames)
        self.grey_ok = grey_ok
        self.adjust = adjust          # (w, h) the "driver" forces
        self.drop_after = drop_after  # frame index before the gap
        self.drop_n = drop_n
        self.maps = {}
        self.queued = []
        self.streaming = False
        self.seq = 0
        self.served = 0
        self.W = self.H = 0
        self.log = []

    def open(self, path):
        return 42

    def ioctl(self, fd, req, arg):
        self.log.append(req)
        if req == cap.VIDIOC_S_FMT:
            pix = arg.fmt.pix
            self.W, self.H = int(pix.width), int(pix.height)
            if self.adjust:
                pix.width, pix.height = self.adjust
                self.W, self.H = self.adjust
            if pix.pixelformat == cap.V4L2_PIX_FMT_GREY \
                    and not self.grey_ok:
                pix.pixelformat = cap.V4L2_PIX_FMT_YUYV
            bpp = 1 if pix.pixelformat == cap.V4L2_PIX_FMT_GREY else 2
            pix.bytesperline = self.W * bpp
            pix.sizeimage = self.W * bpp * self.H
            self.sizeimage = int(pix.sizeimage)
        elif req == cap.VIDIOC_REQBUFS:
            arg.count = min(int(arg.count), 4)
            self.n_bufs = int(arg.count)
        elif req == cap.VIDIOC_QUERYBUF:
            arg.length = self.sizeimage
            arg.m.offset = int(arg.index) * self.sizeimage
        elif req == cap.VIDIOC_QBUF:
            self.queued.append(int(arg.index))
        elif req == cap.VIDIOC_DQBUF:
            if not self.frames or not self.queued:
                raise OSError(11, "EAGAIN")
            idx = self.queued.pop(0)
            luma = self.frames.pop(0)
            m = self.maps[idx * self.sizeimage]
            raw = np.full(self.sizeimage, 0x80, np.uint8)
            raw[0::2] = luma.reshape(-1)
            m.buf[:] = raw.tobytes()
            arg.index = idx
            arg.bytesused = self.sizeimage
            if self.drop_after is not None \
                    and self.served == self.drop_after:
                self.seq += self.drop_n
            arg.sequence = self.seq
            self.seq += 1
            self.served += 1
        elif req in (cap.VIDIOC_STREAMON, cap.VIDIOC_STREAMOFF):
            self.streaming = req == cap.VIDIOC_STREAMON
        else:
            raise OSError(25, f"unexpected ioctl {req:#x}")
        return 0

    def mmap(self, fd, length, offset):
        m = FakeMMap(length)
        self.maps[offset] = m
        return m

    def wait_readable(self, fd, timeout):
        return bool(self.frames)

    def close(self, fd):
        pass


def _frames(n, H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (H, W)).astype(np.uint8)
            for _ in range(n)]


def test_v4l2_reader_yuyv_negotiation_and_frames():
    frames = _frames(5)
    io = FakeV4L2IO(list(frames))
    rd = cap.V4L2Reader("/dev/video9", 48, 32, io=io)
    assert rd.pixelformat == cap.V4L2_PIX_FMT_YUYV
    got = rd.read_frames(0, 5)
    assert got.shape == (5, 32, 48)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    # EOF after the last frame
    assert rd.read_frames(5, 2).shape[0] == 0
    rd.close()
    assert cap.VIDIOC_STREAMON in io.log
    assert cap.VIDIOC_STREAMOFF in io.log
    assert all(m.closed for m in io.maps.values())


def test_v4l2_reader_grey_fast_path():
    frames = _frames(3, seed=2)
    io = FakeV4L2IO(list(frames), grey_ok=True)

    # GREY device serves 1-byte luma directly.
    class GreyIO(FakeV4L2IO):
        def ioctl(self, fd, req, arg):
            if req == cap.VIDIOC_DQBUF and self.frames and self.queued:
                idx = self.queued.pop(0)
                luma = self.frames.pop(0)
                m = self.maps[idx * self.sizeimage]
                m.buf[:] = luma.tobytes()
                arg.index = idx
                arg.bytesused = self.sizeimage
                arg.sequence = self.seq
                self.seq += 1
                self.served += 1
                self.log.append(req)
                return 0
            return super().ioctl(fd, req, arg)

    io = GreyIO(list(frames), grey_ok=True)
    rd = cap.V4L2Reader("/dev/video9", 48, 32, io=io)
    assert rd.pixelformat == cap.V4L2_PIX_FMT_GREY
    got = rd.read_frames(0, 3)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_v4l2_reader_sequence_gap_inserts_dummies():
    frames = _frames(4, seed=3)
    io = FakeV4L2IO(list(frames), drop_after=2, drop_n=2)
    rd = cap.V4L2Reader("/dev/video9", 48, 32, io=io)
    got = rd.read_frames(0, 6)
    assert got.shape[0] == 6
    np.testing.assert_array_equal(got[0], frames[0])
    np.testing.assert_array_equal(got[1], frames[1])
    # two black dummies replace the gap, then the stream resumes
    assert (got[2] == 0).all() and (got[3] == 0).all()
    np.testing.assert_array_equal(got[4], frames[2])
    np.testing.assert_array_equal(got[5], frames[3])
    assert rd.dropped_frames == 2


def test_v4l2_open_stream_routes_streaming_device(monkeypatch,
                                                  tmp_path):
    frames = _frames(2, seed=4)
    fake_io = FakeV4L2IO(list(frames))

    def fake_probe(path):
        return cap.CaptureDevice(
            path=path, card="loopback", driver="fake",
            capabilities=cap._CAP_VIDEO_CAPTURE | cap._CAP_STREAMING)

    monkeypatch.setattr(cap, "_probe_v4l2", fake_probe)
    sel = cap.CaptureSelector(enumerate_fn=lambda: [fake_probe(
        "/dev/video7")])
    sel.refresh()
    sel.select("/dev/video7")
    sel.config.width, sel.config.height = 48, 32
    rd = sel.open_stream(io=fake_io)
    assert isinstance(rd, cap.V4L2Reader)
    assert rd.read_frames(0, 2).shape == (2, 32, 48)
    rd.close()


def test_v4l2_fed_decode_equals_file_decode(tmp_path):
    """Frames pulled through the V4L2 transport decode to the same WAV
    as the same frames decoded from a file (the loopback contract)."""
    from sdvpcmdecoder_tpu.pipeline import batch_driver, ingest
    from test_device_driver import _write_capture
    tmp = str(tmp_path)
    p = _write_capture(tmp, "c", 3, 294, seed=11)
    with ingest.open_capture(p) as fr:
        frames = [f for f in fr.read_frames(0, 3)]
    H, W = frames[0].shape
    io = FakeV4L2IO(list(frames))
    rd = cap.V4L2Reader("/dev/video9", W, H, io=io)
    got = rd.read_frames(0, 3)
    rd.close()
    p2 = os.path.join(tmp, "v4l2.y4m")
    ingest.write_y4m(p2, got)
    outs = []
    for tag, src in (("file", p), ("v4l2", p2)):
        o = os.path.join(tmp, f"{tag}.wav")
        batch_driver.BatchDecoder([(src, o)], lines_per_field=294,
                                  hyst_limit=1, shift_limit=1,
                                  backend="native").run()
        outs.append(open(o, "rb").read())
    assert outs[0] == outs[1]


def test_capture_preview_snapshots(monkeypatch, tmp_path):
    """CaptureSelector.preview: the dialog's live-preview analog writes
    PPM snapshots of the selected device's frames."""
    from sdvpcmdecoder_tpu.pipeline import render
    frames = _frames(2, seed=9)
    fake_io = FakeV4L2IO(list(frames))

    def fake_probe(path):
        return cap.CaptureDevice(
            path=path, card="loopback", driver="fake",
            capabilities=cap._CAP_VIDEO_CAPTURE | cap._CAP_STREAMING)

    monkeypatch.setattr(cap, "_probe_v4l2", fake_probe)
    sel = cap.CaptureSelector(
        enumerate_fn=lambda: [fake_probe("/dev/video7")])
    sel.refresh()
    sel.select("/dev/video7")
    sel.config.width, sel.config.height = 48, 32
    p = str(tmp_path / "prev.ppm")
    paths = sel.preview(p, n_frames=2, io=fake_io)
    assert paths == [p, p + ".1"]
    img = render.read_ppm(p)
    np.testing.assert_array_equal(img[:, :, 0], frames[0])
