"""In-process AVI container ingest — no FFmpeg required.

The reference opens captures through libav (ffmpegwrapper.cpp:543
slotOpenInput) and detects dropped frames from DTS gaps
(ffmpegwrapper.h:172-174).  VirtualDub-style AVI is the dominant wrapper
for the VHS/PCM capture workflow this decoder serves, and the container
itself records drops: a zero-length `00dc`/`00db` idx1 entry is exactly a
dropped frame slot.  This module parses RIFF/AVI (including OpenDML
`AVIX` extension segments for >1 GiB captures) and decodes the capture
codecs that appear in practice without any external binary:

  * BI_RGB (uncompressed DIB, 8/24/32-bit, bottom-up or top-down)
  * Y800 / Y8 / GREY (raw luma)
  * YUY2 / YUYV / V422 (packed 4:2:2, luma = even bytes)
  * UYVY / HDYC       (packed 4:2:2, luma = odd bytes)
  * I420 / IYUV / YV12 (planar, luma plane first)
  * MJPG               (per-frame JPEG via Pillow, gated on import)
  * HFYU               (HuffYUV YUY2 left-predictor with extradata
                        tables — the VirtualDub lossless default; see
                        pipeline/huffyuv.py for the exact scope)
  * LAGS               (Lagarith YV12/solid-gray; pipeline/lagarith.py)
  * ULY0/ULH0/ULY2/ULH2 (Ut Video planar YUV; pipeline/utvideo.py)
  * FFV1                (version 3, golomb + range coders;
                        pipeline/ffv1.py — the archival standard)

Compressed codecs outside this set (x264, exotic HuffYUV variants...)
raise a clear error pointing at the FFmpeg transcode path.

`AVIReader` mirrors `ingest.VideoReader`'s interface (width/height/
n_frames/read_frames/read_frames_view/close) with the same timeline
semantics: dropped slots read back as all-black frames, which the V2D
prescan rejects so the decoder inserts interleave-preserving dummy
frames downstream.
"""
from __future__ import annotations

import mmap
import struct
from pathlib import Path

import numpy as np

# Luma from RGB: integer Rec.601 (the reference converts through
# libswscale to GRAY8 with the same coefficients).
_R, _G, _B = 77, 150, 29  # /256

_GRAY_FOURCC = {b"Y800", b"Y8  ", b"GREY", b"\x00\x00\x00\x00"}
_YUY2_FOURCC = {b"YUY2", b"YUYV", b"V422", b"YUNV"}
_UYVY_FOURCC = {b"UYVY", b"HDYC", b"UYNV"}
_I420_FOURCC = {b"I420", b"IYUV", b"YV12"}
_MJPG_FOURCC = {b"MJPG", b"mjpg", b"dmb1"}
_HFYU_FOURCC = {b"HFYU", b"hfyu"}
_LAGS_FOURCC = {b"LAGS", b"lags"}
_ULY_FOURCC = {b"ULY0", b"ULH0", b"ULY2", b"ULH2"}
_FFV1_FOURCC = {b"FFV1"}


class AVIError(ValueError):
    pass


def _u32(buf, off):
    try:
        return struct.unpack_from("<I", buf, off)[0]
    except struct.error as e:
        # Truncated container: surface the parser's own error class
        # (callers treat AVIError as "this capture is unreadable").
        raise AVIError(f"truncated AVI: {e}") from e


class AVIReader:
    """Frame batch reader for AVI captures (VideoReader interface)."""

    def __init__(self, path, raw_size=None, use_native=None,
                 timeline=None, fmt=None):
        # raw_size / use_native / fmt accepted for interface parity.
        self.path = str(path)
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0,
                             access=mmap.ACCESS_READ)
        self.dropped_frames = 0
        self._parse()

    # -- container parse --------------------------------------------------
    def _parse(self):
        mm = self._mm
        if len(mm) < 12 or mm[0:4] != b"RIFF" or mm[8:12] != b"AVI ":
            raise AVIError(f"{self.path!r} is not an AVI file")
        self._entries = []   # (offset_of_data, size) per stored frame
        self._timeline = []  # timeline slot -> stored index or -1
        self._vids_seen = 0
        self.width = self.height = 0
        self._compression = b"\x00\x00\x00\x00"
        self._bitcount = 8
        self._stream_no = None
        self._movi_start = None
        self._have_idx = False
        # Walk top-level RIFF segments: the main 'AVI ' plus any OpenDML
        # 'AVIX' continuation segments.
        off = 0
        while off + 12 <= len(mm):
            if mm[off:off + 4] != b"RIFF":
                break
            seg_size = _u32(mm, off + 4)
            self._walk_list(off + 12, off + 8 + seg_size)
            off += 8 + seg_size + (seg_size & 1)
        if self.width == 0 or self.height == 0:
            raise AVIError(f"{self.path!r}: no video stream header")
        if not self._have_idx:
            # No idx1 (e.g. streamed capture): the movi scan already
            # collected entries in order; every one is a timeline slot.
            self._timeline = list(range(len(self._entries)))
        self._finish_timeline()
        self._init_codec()

    def _walk_list(self, start, end):
        mm = self._mm
        off = start
        while off + 8 <= end:
            ckid = mm[off:off + 4]
            size = _u32(mm, off + 4)
            body = off + 8
            if ckid == b"LIST":
                ltype = mm[body:body + 4]
                if ltype == b"movi":
                    if self._movi_start is None:
                        self._movi_start = body
                    self._scan_movi(body + 4, body + size)
                elif ltype in (b"hdrl", b"strl", b"odml"):
                    self._walk_list(body + 4, body + size)
            elif ckid == b"strh":
                self._cur_strh = mm[body:body + size]
                self._cur_stream_idx = getattr(self, "_strh_count", 0)
                self._strh_count = self._cur_stream_idx + 1
            elif ckid == b"strf":
                self._on_strf(mm[body:body + size])
            elif ckid == b"idx1":
                self._on_idx1(body, size)
            elif ckid == b"indx":
                self._on_indx(body, size)
            off = body + size + (size & 1)

    def _on_strf(self, strf):
        strh = getattr(self, "_cur_strh", b"")
        if strh[0:4] != b"vids":
            return
        if self._stream_no is not None:
            return  # first video stream only
        self._stream_no = getattr(self, "_cur_stream_idx", 0)
        if len(strf) >= 20:  # BITMAPINFOHEADER
            self.width = struct.unpack_from("<i", strf, 4)[0]
            self._bmp_height = struct.unpack_from("<i", strf, 8)[0]
            self.height = abs(self._bmp_height)
            self._bitcount = struct.unpack_from("<H", strf, 14)[0]
            comp = struct.unpack_from("<I", strf, 16)[0]
            self._compression = strf[16:20] if comp else b"\x00\x00\x00\x00"
            # Codec extradata (HuffYUV tables etc) follows the 40-byte
            # BITMAPINFOHEADER inside strf.
            self._extradata = bytes(strf[40:])

    def _stream_tag(self):
        return b"%02d" % self._stream_no if self._stream_no is not None \
            else b"00"

    def _scan_movi(self, start, end):
        """Sequential chunk scan (fallback when idx1/indx are absent,
        and the source of truth for chunk positions in 'rec ' groups)."""
        if self._have_idx:
            return
        mm = self._mm
        tag = self._stream_tag()
        off = start
        while off + 8 <= end:
            ckid = mm[off:off + 4]
            size = _u32(mm, off + 4)
            if ckid == b"LIST" and mm[off + 8:off + 12] == b"rec ":
                self._scan_movi(off + 12, off + 8 + size)
            elif ckid[:2] == tag and ckid[2:4] in (b"db", b"dc"):
                self._entries.append((off + 8, size))
            off += 8 + size + (size & 1)

    def _on_idx1(self, body, size):
        if getattr(self, "_have_indx", False):
            # OpenDML files carry BOTH: the indx covers every segment,
            # the legacy idx1 only the first RIFF — it must not clobber
            # the full index (frames in AVIX segments would vanish).
            return
        mm = self._mm
        tag = self._stream_tag()
        # Offsets are relative to the 'movi' list fourcc in spec, but
        # many muxers write absolute file offsets; detect from entry 0.
        entries, timeline = [], []
        n = size // 16
        base = None
        for k in range(n):
            e = body + 16 * k
            ckid = mm[e:e + 4]
            if not (ckid[:2] == tag and ckid[2:4] in (b"db", b"dc")):
                continue
            ofs = _u32(mm, e + 8)
            csz = _u32(mm, e + 12)
            if csz == 0:
                timeline.append(-1)          # dropped frame slot
                continue
            if base is None:
                movi = self._movi_start if self._movi_start is not None \
                    else 0
                # absolute if the chunk header is where ofs points
                base = 0 if mm[ofs:ofs + 4] == ckid else movi
            timeline.append(len(entries))
            entries.append((base + ofs + 8, csz))
        if entries or timeline:
            self._have_idx = True
            self._entries = entries
            self._timeline = timeline

    def _on_indx(self, body, size):
        """OpenDML super/standard index (AVI 2.0).  Standard 'ix##'
        chunk indexes are resolved relative to their qwBaseOffset."""
        mm = self._mm
        if size < 24:
            return
        longs_per_entry = struct.unpack_from("<H", mm, body)[0]
        sub_type = mm[body + 2]
        idx_type = mm[body + 3]
        n_in_use = _u32(mm, body + 4)
        ckid = mm[body + 8:body + 12]
        tag = self._stream_tag()
        if not (ckid[:2] == tag and ckid[2:4] in (b"db", b"dc")):
            return
        if idx_type == 0x01 and sub_type == 0:  # AVI_INDEX_OF_CHUNKS
            base = struct.unpack_from("<Q", mm, body + 12)[0]
            entries, timeline = [], []
            for k in range(n_in_use):
                e = body + 24 + 8 * k
                ofs = _u32(mm, e)
                sz = _u32(mm, e + 4) & 0x7FFFFFFF
                if sz == 0:
                    timeline.append(-1)
                    continue
                timeline.append(len(entries))
                entries.append((base + ofs, sz))
            if entries:
                if not getattr(self, "_have_indx", False):
                    # First indx chunk: discard whatever the movi scan
                    # or a legacy idx1 collected — indx is authoritative.
                    self._entries = []
                    self._timeline = []
                self._have_idx = True
                self._have_indx = True
                off = len(self._entries)
                self._entries = self._entries + entries
                self._timeline = self._timeline + \
                    [t if t < 0 else t + off for t in timeline]
        elif idx_type == 0x00:  # AVI_INDEX_OF_INDEXES: walk sub-indexes
            for k in range(n_in_use):
                e = body + 24 + max(longs_per_entry, 4) * 4 * k
                sub_ofs = struct.unpack_from("<Q", mm, e)[0]
                sub_size = _u32(mm, e + 8)
                if 0 < sub_ofs + 8 <= len(mm) and sub_size > 8:
                    # sub_ofs points at the 'ix##' chunk header
                    self._on_indx(sub_ofs + 8, sub_size - 8)

    def _finish_timeline(self):
        self._stored_frames = len(self._entries)
        tl = np.asarray(self._timeline, np.int64)
        self.n_frames = len(tl)
        self.dropped_frames = int((tl < 0).sum())
        self._timeline_map = tl if self.dropped_frames else None

    # -- codec ------------------------------------------------------------
    def _init_codec(self):
        comp = self._compression
        if comp == b"\x00\x00\x00\x00" and self._bitcount in (8, 24, 32):
            self._decode = self._dec_dib   # BI_RGB (8-bit = gray palette)
        elif comp in _GRAY_FOURCC:
            self._decode = self._dec_gray
        elif comp in _YUY2_FOURCC:
            self._decode = self._dec_yuy2
        elif comp in _UYVY_FOURCC:
            self._decode = self._dec_uyvy
        elif comp in _I420_FOURCC:
            self._decode = self._dec_i420
        elif comp in _HFYU_FOURCC:
            from . import huffyuv as hf
            try:
                self._hfyu_lens = hf.parse_extradata(
                    getattr(self, "_extradata", b""))
            except ValueError as e:
                raise AVIError(
                    f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                    "-pix_fmt gray out.y4m`")
            self._hfyu = hf
            self._decode = self._dec_hfyu
            from ..ops import stitch_native as _sn
            ly, lu, lv = self._hfyu_lens
            self._batch = lambda entries: _sn.hfyu_decode_frames(
                self._mm, entries, self.width, self.height, ly, lu, lv)
        elif comp in _LAGS_FOURCC:
            from . import lagarith as lg
            self._lags = lg
            self._decode = self._dec_lags
            from ..ops import stitch_native as _sn
            self._batch = lambda entries: _sn.lags_decode_frames_gray(
                self._mm, entries, self.width, self.height)
        elif comp in _ULY_FOURCC:
            from . import utvideo as utv
            try:
                self._uly_info = utv.StreamInfo(
                    comp, getattr(self, "_extradata", b""))
            except utv.UtVideoError as e:
                raise AVIError(
                    f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                    "-pix_fmt gray out.y4m`")
            self._utv = utv
            self._decode = self._dec_uly
            from ..ops import stitch_native as _sn
            info = self._uly_info
            self._batch = lambda entries: _sn.uly_decode_frames_gray(
                self._mm, entries, self.width, self.height,
                info.slices, info.subsampled_h)
        elif comp in _FFV1_FOURCC:
            from . import ffv1 as fv
            try:
                self._ffv1 = fv.Decoder(getattr(self, "_extradata", b""),
                                        self.width, self.height)
            except fv.FFV1Error as e:
                raise AVIError(
                    f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                    "-pix_fmt gray out.y4m`")
            self._fv = fv
            self._ffv1_next = 0     # contexts carry: decode in order
            self._decode = self._dec_ffv1
        elif comp in _MJPG_FOURCC:
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError:
                raise AVIError(
                    "MJPG AVI needs Pillow; transcode to Y4M instead")
            self._decode = self._dec_mjpg
        else:
            raise AVIError(
                f"unsupported AVI codec {comp!r}: pre-transcode with "
                "`ffmpeg -i cap.avi -pix_fmt gray out.y4m` or recapture "
                "uncompressed/MJPEG")

    def _chunk(self, k):
        off, size = self._entries[k]
        return np.frombuffer(self._mm, np.uint8, size, off)

    def _dec_gray(self, k):
        W, H = self.width, self.height
        d = self._chunk(k)
        stride = (W + 3) & ~3 if len(d) >= ((W + 3) & ~3) * H else W
        d = d[:stride * H].reshape(H, stride)[:, :W]
        return d

    def _dec_dib(self, k):
        """BI_RGB DIB: 4-byte-aligned rows, bottom-up when biHeight>0."""
        W, H = self.width, self.height
        bc = self._bitcount
        bpp = bc // 8
        stride = (W * bpp + 3) & ~3
        d = self._chunk(k)[:stride * H].reshape(H, stride)
        if bc == 8:
            out = d[:, :W]
        else:
            px = d[:, :W * bpp].reshape(H, W, bpp)
            b = px[:, :, 0].astype(np.uint32)
            g = px[:, :, 1].astype(np.uint32)
            r = px[:, :, 2].astype(np.uint32)
            out = ((_R * r + _G * g + _B * b) >> 8).astype(np.uint8)
        if self._bmp_height > 0:   # bottom-up
            out = out[::-1]
        return out

    def _dec_yuy2(self, k):
        W, H = self.width, self.height
        return self._chunk(k)[:2 * W * H].reshape(H, 2 * W)[:, 0::2]

    def _dec_uyvy(self, k):
        W, H = self.width, self.height
        return self._chunk(k)[:2 * W * H].reshape(H, 2 * W)[:, 1::2]

    def _dec_i420(self, k):
        W, H = self.width, self.height
        return self._chunk(k)[:W * H].reshape(H, W)

    def _dec_lags(self, k):
        off, size = self._entries[k]
        try:
            return self._lags.decode_frame_gray(
                self._mm[off:off + size], self.width, self.height)
        except self._lags.LagarithError as e:
            raise AVIError(
                f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                "-pix_fmt gray out.y4m`")

    def _dec_uly(self, k):
        off, size = self._entries[k]
        try:
            return self._utv.decode_frame_gray(
                self._mm[off:off + size], self.width, self.height,
                self._uly_info)
        except self._utv.UtVideoError as e:
            raise AVIError(
                f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                "-pix_fmt gray out.y4m`")

    def _dec_ffv1(self, k):
        # FFV1 carries adaptive contexts across non-keyframes, so the
        # stream decodes strictly in stored order; out-of-order reads
        # rewind to the start and roll forward (reads are sequential in
        # practice — the batch driver walks the capture front to back).
        if k < self._ffv1_next:
            self._ffv1.reset()
            self._ffv1_next = 0
        try:
            while self._ffv1_next < k:
                off, size = self._entries[self._ffv1_next]
                self._ffv1.decode_frame_gray(self._mm[off:off + size])
                self._ffv1_next += 1
            off, size = self._entries[k]
            out, _ = self._ffv1.decode_frame_gray(
                self._mm[off:off + size])
        except self._fv.FFV1Error as e:
            raise AVIError(
                f"{e}; pre-transcode with `ffmpeg -i cap.avi "
                "-pix_fmt gray out.y4m`")
        self._ffv1_next = k + 1
        return out

    def _dec_mjpg(self, k):
        import io
        off, size = self._entries[k]
        img = self._pil.open(io.BytesIO(self._mm[off:off + size]))
        return np.asarray(img.convert("L"))

    def _dec_hfyu(self, k):
        off, size = self._entries[k]
        return self._hfyu.decode_frame(self._mm[off:off + size],
                                       self.width, self.height,
                                       self._hfyu_lens)

    # -- VideoReader interface --------------------------------------------
    def _slot_entry(self, slot):
        """timeline slot -> stored index (or -1 for a dropped slot)."""
        if self._timeline_map is not None:
            return int(self._timeline_map[slot])
        return slot

    def read_frames(self, first, count):
        """-> uint8 [count, H, W]; dropped slots read all-black."""
        count = max(0, min(count, self.n_frames - first))
        batch = getattr(self, "_batch", None)
        if batch is not None and count > 1:
            entries = []
            for i in range(count):
                k = self._slot_entry(first + i)
                entries.append(self._entries[k] if k >= 0 else (-1, 0))
            got = batch(entries)
            if got is not None:
                rcs, out = got
                # any failing frame re-decodes per-frame so the exact
                # codec error message (with transcode hint) surfaces
                for i in np.nonzero(rcs != 0)[0]:
                    f = self._decode(self._slot_entry(first + int(i)))
                    h = min(f.shape[0], self.height)
                    w = min(f.shape[1], self.width)
                    out[int(i)] = 0
                    out[int(i), :h, :w] = f[:h, :w]
                return out
        out = np.zeros((count, self.height, self.width), np.uint8)
        for i in range(count):
            k = self._slot_entry(first + i)
            if k < 0:
                continue
            f = self._decode(k)
            h, w = min(f.shape[0], self.height), min(f.shape[1], self.width)
            out[i, :h, :w] = f[:h, :w]
        return out

    def read_frames_view(self, first, count):
        return self.read_frames(first, count)

    def close(self):
        if getattr(self, "_mm", None) is not None:
            self._mm.close()
            self._file.close()
            self._mm = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def resolve_payloads(frames, codec, payloads=None, extradata=None):
    """Per-frame chunk bytes + codec extradata for the compressed
    codecs, shared by write_avi and mkv.write_mkv.  Explicit payloads
    pass through; missing extradata is built so the file stays
    self-describing either way."""
    if payloads is None:
        if codec == "HFYU":
            from . import huffyuv as hf
            extradata, payloads = hf.encode(frames)
        elif codec == "LAGS":
            from . import lagarith as lg
            payloads = lg.encode(frames)
        elif codec in ("ULY0", "ULY2"):
            from . import utvideo as utv
            extradata, payloads = utv.encode(frames, codec)
        elif codec == "FFV1":
            from . import ffv1 as fv
            extradata, payloads = fv.encode(frames)
        else:
            raise ValueError(f"unsupported codec {codec}")
    elif extradata is None:
        if codec in ("ULY0", "ULY2"):
            from . import utvideo as utv
            extradata = utv.build_extradata(codec)
        elif codec == "FFV1":
            from . import ffv1 as fv
            extradata = fv.build_extradata()
    return payloads, extradata


def write_avi(path, frames, codec="Y800", fps=25, drops=None,
              quality=85, payloads=None, extradata=None):
    """Test/debug AVI writer.

    frames: uint8 [F, H, W] luma.  codec: Y800 | YUY2 | UYVY | DIB
    (24-bit bottom-up BI_RGB) | MJPG (needs Pillow) | HFYU (HuffYUV,
    adaptive tables in strf extradata) | LAGS (Lagarith).  drops:
    optional sorted timeline slot indices recorded as zero-length idx1
    entries (the VirtualDub dropped-frame convention).  payloads:
    optional pre-encoded per-frame chunk bytes (overrides the built-in
    encoder; `frames` still sets dimensions/count)."""
    frames = np.asarray(frames, np.uint8)
    F, H, W = frames.shape
    drops = sorted(set(drops or []))
    if codec in ("HFYU", "LAGS", "ULY0", "ULY2", "FFV1"):
        hfyu_payloads, extradata = resolve_payloads(frames, codec,
                                                    payloads, extradata)
    else:
        hfyu_payloads = payloads
    extradata = extradata or b""

    def enc(f):
        if codec == "Y800":
            return f.tobytes()
        if codec == "YUY2":
            buf = np.full((H, 2 * W), 128, np.uint8)
            buf[:, 0::2] = f
            return buf.tobytes()
        if codec == "UYVY":
            buf = np.full((H, 2 * W), 128, np.uint8)
            buf[:, 1::2] = f
            return buf.tobytes()
        if codec == "DIB":
            stride = (W * 3 + 3) & ~3
            buf = np.zeros((H, stride), np.uint8)
            rgb = np.repeat(f[:, :, None], 3, axis=2)
            buf[:, :W * 3] = rgb.reshape(H, W * 3)
            return buf[::-1].tobytes()  # bottom-up
        if codec == "MJPG":
            import io
            from PIL import Image
            bio = io.BytesIO()
            Image.fromarray(f, "L").save(bio, "JPEG", quality=quality)
            return bio.getvalue()
        raise ValueError(codec)

    fourcc = {"Y800": b"Y800", "YUY2": b"YUY2", "UYVY": b"UYVY",
              "DIB": b"\x00\x00\x00\x00", "MJPG": b"MJPG",
              "HFYU": b"HFYU", "LAGS": b"LAGS", "ULY0": b"ULY0",
              "ULY2": b"ULY2", "FFV1": b"FFV1"}[codec]
    bitcount = {"Y800": 8, "YUY2": 16, "UYVY": 16, "DIB": 24,
                "MJPG": 24, "HFYU": 16, "LAGS": 12, "ULY0": 12,
                "ULY2": 16, "FFV1": 8}[codec]
    payloads = hfyu_payloads if hfyu_payloads is not None \
        else [enc(frames[i]) for i in range(F)]

    import io as _io
    movi = _io.BytesIO()
    movi.write(b"movi")
    chunk_ofs = []  # offset of chunk header relative to movi list start
    slots = []      # (is_drop, stored_index)
    stored = 0
    n_slots = F + len(drops)
    di = set(drops)
    for slot in range(n_slots):
        if slot in di:
            slots.append((True, -1))
            continue
        data = payloads[stored]
        chunk_ofs.append(movi.tell())
        movi.write(b"00dc" + struct.pack("<I", len(data)) + data)
        if len(data) & 1:
            movi.write(b"\x00")
        slots.append((False, stored))
        stored += 1
    movi_body = movi.getvalue()

    strh = (b"vids" + fourcc + b"\x00" * 12
            + struct.pack("<II", 1, fps)          # scale, rate
            + struct.pack("<III", 0, n_slots, 0)  # start, length, bufsz
            + struct.pack("<i", -1)               # quality
            + struct.pack("<I", 0)                # samplesize
            + struct.pack("<4H", 0, 0, W, H))
    strf = struct.pack("<IiiHH4sIiiII", 40 + len(extradata), W, H, 1,
                       bitcount,
                       fourcc if codec != "DIB" else b"\x00" * 4,
                       W * H * bitcount // 8, 0, 0, 0, 0) + extradata
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1000000 // fps, 0, 0, 0x10,  # AVIF_HASINDEX
                       n_slots, 0, 1, 0, W, H, 0, 0, 0, 0)

    def chunk(ckid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    # idx1 offsets relative to the movi LIST fourcc (spec form).
    idx = _io.BytesIO()
    ci = 0
    for is_drop, stored_i in slots:
        if is_drop:
            idx.write(b"00dc" + struct.pack("<III", 0x10, 0, 0))
        else:
            size = len(payloads[stored_i])
            idx.write(b"00dc" + struct.pack("<III", 0x10,
                                            chunk_ofs[ci], size))
            ci += 1
    body = hdrl + lst(b"movi", movi_body[4:]) \
        + chunk(b"idx1", idx.getvalue())
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI "
                 + body)
