"""Capture device selection — the capt_sel analog (capt_sel.{h,cpp}).

The reference's capture dialog lists video capture devices (through its
FFmpeg wrapper), lets the user pick one plus a video preset (PAL/NTSC
dimensions, frame rate, color channel for luma extraction, dropped-frame
detection) and hands the resulting configuration to the ingest layer
(capt_sel.h:118-126 request* signals).  Headless analog:

  * `enumerate_devices()` — V4L2 capture devices via ctypes ioctl
    VIDIOC_QUERYCAP on /dev/video* (no Qt, no FFmpeg); returns [] on
    hosts without V4L2 (this bench box).
  * `CaptureConfig` — the saved selection: device, dimensions, fps,
    color channel, drop detection, capture offset.
  * `CaptureSelector` — refresh/select/preset/save state machine
    mirroring the dialog's slots (usrRefresh/selectDevice/usrSetPAL/
    usrSetNTSC/usrSave).

Probing is injectable so selection logic is testable without hardware.
"""
from __future__ import annotations

import ctypes
import fcntl
import glob
import os
from dataclasses import dataclass, field

# Video presets (capt_sel.cpp usrSetPAL/usrSetNTSC; the reference
# captures full-frame interlaced video for the PCM decoder).
PAL_PRESET = dict(width=720, height=576, fps=25)
NTSC_PRESET = dict(width=720, height=480, fps=30)

# Color channel for luma extraction (LIST_COLORS_ALL..LIST_COLOR_B,
# capt_sel.h:66-72): PCM bits ride the luma, but some capture chains
# carry cleaner data in one RGB channel.
COLORS_ALL, COLOR_R, COLOR_G, COLOR_B = range(4)

_VIDIOC_QUERYCAP = 0x80685600  # _IOR('V', 0, struct v4l2_capability)
_CAP_VIDEO_CAPTURE = 0x00000001


class _V4L2Capability(ctypes.Structure):
    _fields_ = [("driver", ctypes.c_char * 16),
                ("card", ctypes.c_char * 32),
                ("bus_info", ctypes.c_char * 32),
                ("version", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("device_caps", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 3)]


@dataclass
class CaptureDevice:
    path: str
    card: str = ""
    driver: str = ""
    capabilities: int = 0

    @property
    def can_capture(self):
        return bool(self.capabilities & _CAP_VIDEO_CAPTURE)


@dataclass
class CaptureConfig:
    """The saved selection handed to the ingest layer (the dialog's
    request* signal payloads)."""
    device: str = ""
    width: int = PAL_PRESET["width"]
    height: int = PAL_PRESET["height"]
    fps: int = PAL_PRESET["fps"]
    color: int = COLORS_ALL
    drop_detect: bool = True
    offset: tuple = (0, 0)


def _probe_v4l2(path):
    """VIDIOC_QUERYCAP one device node; None when not a V4L2 device."""
    cap = _V4L2Capability()
    try:
        fd = os.open(path, os.O_RDWR | os.O_NONBLOCK)
    except OSError:
        return None
    try:
        fcntl.ioctl(fd, _VIDIOC_QUERYCAP, cap)
    except OSError:
        return None
    finally:
        os.close(fd)
    return CaptureDevice(path=path,
                         card=cap.card.decode(errors="replace"),
                         driver=cap.driver.decode(errors="replace"),
                         capabilities=int(cap.device_caps
                                          or cap.capabilities))


def enumerate_devices(dev_glob="/dev/video*", probe=_probe_v4l2):
    """List V4L2 capture-capable devices (requestDeviceList analog).

    `probe` is injectable for tests; returns CaptureDevice list sorted
    by node path, capture-capable nodes only."""
    out = []
    for path in sorted(glob.glob(dev_glob)):
        dev = probe(path)
        if dev is not None and dev.can_capture:
            out.append(dev)
    return out


class CaptureSelector:
    """The dialog's selection state machine, headless."""

    def __init__(self, enumerate_fn=enumerate_devices):
        self._enumerate = enumerate_fn
        self.devices: list[CaptureDevice] = []
        self.config = CaptureConfig()

    def refresh(self):
        """usrRefresh: re-list devices; keeps the selection when the
        device is still present, else clears it."""
        self.devices = self._enumerate()
        if self.config.device and not any(
                d.path == self.config.device for d in self.devices):
            self.config.device = ""
        return self.devices

    def select(self, path_or_index):
        """selectDevice by node path or list index."""
        if isinstance(path_or_index, int):
            dev = self.devices[path_or_index]
        else:
            matches = [d for d in self.devices
                       if d.path == path_or_index]
            if not matches:
                raise ValueError(
                    f"no capture device {path_or_index!r} "
                    f"(have {[d.path for d in self.devices]})")
            dev = matches[0]
        self.config.device = dev.path
        return dev

    def set_pal(self):
        self.config.width = PAL_PRESET["width"]
        self.config.height = PAL_PRESET["height"]
        self.config.fps = PAL_PRESET["fps"]

    def set_ntsc(self):
        self.config.width = NTSC_PRESET["width"]
        self.config.height = NTSC_PRESET["height"]
        self.config.fps = NTSC_PRESET["fps"]

    def set_color(self, channel):
        assert channel in (COLORS_ALL, COLOR_R, COLOR_G, COLOR_B)
        self.config.color = channel

    def set_drop_detect(self, enabled):
        self.config.drop_detect = bool(enabled)

    def set_offset(self, x, y):
        self.config.offset = (int(x), int(y))

    def save(self):
        """usrSave: validate and return the selection."""
        if not self.config.device:
            raise ValueError("no capture device selected")
        return self.config

    def open_stream(self):
        """Open the saved selection as a live frame stream feeding the
        decode pipeline (the reference's capture start: capt_sel accept
        -> VIP runFrameDecode capture events, vin_ffmpeg.cpp:817).

        The device node is read as a sequential stream: Y4M when the
        producer emits Y4M (e.g. a FIFO fed by a capture tool), raw
        gray8 frames of the preset dimensions otherwise.  Character
        devices must already be format-configured (UVC read() mode);
        FIFOs work anywhere and are the tested transport."""
        from . import ingest
        cfg = self.save()
        is_y4m = cfg.device.endswith((".y4m", ".Y4M"))
        # Opening a FIFO for read blocks until the producer connects —
        # that IS live behavior (the reference's VIP waits in LOADING
        # until frames arrive, vin_ffmpeg.h:92-103).
        return ingest.StreamReader(
            cfg.device,
            raw_size=None if is_y4m else (cfg.width, cfg.height))
