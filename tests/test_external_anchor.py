"""End-to-end conformance anchored OUTSIDE this codebase.

The decoder's synthetic fixtures are the inverse of its own decode chain;
a shared encode/decode bug would cancel out.  This test anchors the
stitcher -> audio -> WAV chain to externally-defined facts only:

  * the reference APP's golden STC-007 line words (pcmtester.cpp:119-126,
    constants of the shipped self-test),
  * the format's published 14->16-bit rule (sample = word << 2, two's
    complement; stc007line.cpp:282-326) — hand-computed literals below,
  * the canonical RIFF/WAVE layout (44-byte header, little-endian fields).
"""
import struct

import numpy as np

from sdvpcmdecoder_tpu.formats import stc007
from sdvpcmdecoder_tpu.pipeline import audio as ap
from sdvpcmdecoder_tpu.pipeline import stitcher_stc007 as st
from sdvpcmdecoder_tpu.pipeline import wav

# pcmtester.cpp:119-126 (L_SH0, R_SH48, L_SH95, R_SH143, L_SH190,
# R_SH238, P_SH288, Q_SH336)
GOLDEN_WORDS = (0x3B43, 0x3FDB, 0x3B52, 0x3FDA, 0x3B5F, 0x3FDA,
                0x0495, 0x1DB7)
# Hand-computed (w << 2) as signed 16-bit:
#   0x3B43 -> 0xED0C -> -4852      0x3FDB -> 0xFF6C -> -148
#   0x3B52 -> 0xED48 -> -4792      0x3FDA -> 0xFF68 -> -152
#   0x3B5F -> 0xED7C -> -4740
GOLDEN_PAIRS = ((-4852, -148), (-4792, -152), (-4740, -152))


def test_golden_line_crc_is_consistent():
    w = np.array([GOLDEN_WORDS], np.int64)
    crc = int(stc007.calc_crc(w, xp=np)[0])
    # The reference app validates this line against its own CRC engine
    # (pcmtester.cpp:128-137); any change to our CRC core that still
    # passes self-roundtrip but diverges from CRC-16/CCITT-FALSE would
    # break the ECC property test's corrupted-line bookkeeping too.
    assert 0 <= crc <= 0xFFFF
    # independent bit-serial CRC-16/CCITT-FALSE (non-augmented form,
    # init 0xFFFF, poly 0x1021 — the textbook definition)
    reg = 0xFFFF
    for word in GOLDEN_WORDS:
        for bit in range(13, -1, -1):
            inbit = (word >> bit) & 1
            top = ((reg >> 15) ^ inbit) & 1
            reg = (reg << 1) & 0xFFFF
            if top:
                reg ^= 0x1021
    assert crc == reg, (hex(crc), hex(reg))


def test_golden_capture_to_wav_bytes(tmp_path):
    """A buffer of golden lines must produce EXACTLY the hand-computed
    sample bytes inside a spec-conformant RIFF container."""
    n_lines = 2 * 294
    w = np.tile(np.array(GOLDEN_WORDS, np.int64), (n_lines, 1))
    crcs = np.asarray(stc007.calc_crc(w, xp=np))
    conv = st.LineStore.from_decoded(
        w, crcs, np.ones(n_lines, bool), np.ones(n_lines),
        1 + 2 * np.arange(n_lines))
    stitcher = st.STC007Stitcher()
    n_blocks = stitcher.perform_deinterleave(conv)
    assert n_blocks == n_lines - 112
    chunks = stitcher.pop_sample_chunks()
    samples, valid, blk, rate = st.chunks_to_arrays(chunks)
    assert valid.all()

    proc = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD)
    out = proc.process(samples, valid, blk, file_end=True)

    path = tmp_path / "golden.wav"
    writer = wav.WavWriter(path, 44100)
    writer.write(out)
    writer.close()
    data = path.read_bytes()

    # RIFF/WAVE header per the public spec.
    n = len(out)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 4 * n, b"WAVE", b"fmt ", 16, 1, 2, 44100,
        44100 * 4, 4, 16, b"data", 4 * n)
    assert data[:44] == hdr
    # Sample payload: the hand-computed pairs repeating.
    expect = struct.pack("<6h", *(v for p in GOLDEN_PAIRS for v in p))
    body = data[44:]
    assert len(body) == 4 * n
    assert body[:12] == expect
    assert body == expect * (len(body) // 12)
