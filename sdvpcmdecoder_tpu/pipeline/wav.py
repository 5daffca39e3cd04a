"""WAV writer — canonical 44-byte RIFF header + interleaved int16 LE.

Mirrors the reference SamplesToWAV (samples2wav.h:51-80 header layout,
samples2wav.cpp:306-343 write + patch-on-flush): the header's RIFF and data
sizes are patched on every flush so the file stays valid mid-run — the
decoder's "checkpoint" analog for long batch jobs.
"""
from __future__ import annotations

import io
import struct
from pathlib import Path

import numpy as np

HEADER_SIZE = 44


def _header(sample_rate: int, data_bytes: int, channels: int = 2,
            bits: int = 16) -> bytes:
    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_bytes, b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate, byte_rate, block_align, bits,
        b"data", data_bytes)


class WavWriter:
    """Streaming stereo 16-bit WAV writer with valid-on-flush headers."""

    def __init__(self, path: str | Path, sample_rate: int = 44100,
                 resume_at: int | None = None):
        """resume_at: reopen an existing file, truncate to that many
        sample pairs and append (checkpoint/resume path)."""
        self.path = Path(path)
        self.sample_rate = sample_rate
        if resume_at is not None and self.path.exists():
            self._data_bytes = resume_at * 4
            self._fh = open(self.path, "r+b")
            self._fh.truncate(HEADER_SIZE + self._data_bytes)
            self._fh.seek(0)
            self._fh.write(_header(sample_rate, self._data_bytes))
            self._fh.seek(HEADER_SIZE + self._data_bytes)
        else:
            self._data_bytes = 0
            self._fh = open(self.path, "wb")
            self._fh.write(_header(sample_rate, 0))

    @property
    def samples_written(self) -> int:
        """Sample pairs written so far (the checkpoint resume point)."""
        return self._data_bytes // 4

    def write(self, samples: np.ndarray):
        """samples [N, 2] int16 (L, R)."""
        arr = np.ascontiguousarray(samples.astype("<i2"))
        self._fh.write(arr.tobytes())
        self._data_bytes += arr.nbytes

    def flush(self):
        self._fh.flush()
        pos = self._fh.tell()
        self._fh.seek(0)
        self._fh.write(_header(self.sample_rate, self._data_bytes))
        self._fh.seek(pos)
        self._fh.flush()

    def set_sample_rate(self, rate: int):
        """Rate switch mid-stream patches the header (samples2wav.cpp:326)."""
        self.sample_rate = rate

    def close(self):
        if self._fh.closed:
            return
        self.flush()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_wav(path, samples: np.ndarray, sample_rate: int = 44100):
    with WavWriter(path, sample_rate) as w:
        w.write(samples)


def read_wav(path):
    """Minimal reader for tests: returns (samples [N,2] int16, rate)."""
    raw = Path(path).read_bytes()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    (rate,) = struct.unpack_from("<I", raw, 24)
    (data_bytes,) = struct.unpack_from("<I", raw, 40)
    body = raw[HEADER_SIZE:HEADER_SIZE + data_bytes]
    return np.frombuffer(body, dtype="<i2").reshape(-1, 2), rate
