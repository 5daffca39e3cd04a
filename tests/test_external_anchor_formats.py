"""PCM-1 / PCM-16x0 end-to-end conformance anchored OUTSIDE this codebase
(the STC-007 twin lives in test_external_anchor.py).

External facts used:
  * the reference app's golden self-test vectors: PCM-1 words + CRC
    0x9EB9 (pcmtester.cpp:9-37), PCM-16x0 words + CRC 0xFB40 (:40-66);
  * PCM-1's published 13->16-bit ranged expansion (pcm1line.cpp:196-233)
    — hand-computed literals below;
  * PCM-16x0's 16-bit two's-complement passthrough
    (pcm16x0subline.cpp getSample);
  * the canonical 44-byte RIFF/WAVE layout.
"""
import struct

import numpy as np

from sdvpcmdecoder_tpu.formats import pcm1, pcm16x0
from sdvpcmdecoder_tpu.pipeline import audio as ap
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm1 as sp1
from sdvpcmdecoder_tpu.pipeline import stitcher_pcm16x0 as sp16
from sdvpcmdecoder_tpu.pipeline import wav

# pcmtester.cpp:14-21 (L2, R2, L4, R4, L6, R6) + golden CRC
P1_WORDS = (0x1A35, 0x1248, 0x0DD9, 0x13FB, 0x1C0E, 0x09CB)
P1_CRC = 0x9EB9
# Hand-computed 13->16-bit expansion (range bit 1<<12, sign bit 1<<11):
#   0x1A35: low range, negative: ((0x0A35)<<2)|0xC000 = 0xE8D4 -> -5932
#   0x1248: low range, positive:  (0x0248)<<2         = 0x0920 ->  2336
#   0x0DD9: high range:           0x0DD9<<4           = 0xDD90 -> -8816
#   0x13FB: low range, positive:  (0x03FB)<<2         = 0x0FEC ->  4076
#   0x1C0E: low range, negative: ((0x0C0E)<<2)|0xC000 = 0xF038 -> -4040
#   0x09CB: high range:           0x09CB<<4           = 0x9CB0 -> -25424
P1_PAIRS = {(-5932, 2336), (-8816, 4076), (-4040, -25424)}

# pcmtester.cpp:43-50 (R1P1L1, L2P2R2, R3P3L3) + golden CRC
P16_WORDS = (0xD527, 0x9C36, 0x02A5)
P16_CRC = 0xFB40


def test_pcm1_golden_crc_and_scheme():
    w = np.array([P1_WORDS], np.int64)
    crc = int(np.asarray(pcm1.calc_crc(w, xp=np))[0])
    assert crc == P1_CRC
    # Independent bit-serial CRC-16/CCITT with PCM-1's complemented
    # scheme: input bits inverted, output complemented (pcm1line.cpp
    # calcCRC) — pins the scheme, not just the value.
    reg = 0xFFFF
    for word in P1_WORDS:
        for bit in range(12, -1, -1):
            inbit = (((word >> bit) & 1) ^ 1) & 1
            top = ((reg >> 15) ^ inbit) & 1
            reg = (reg << 1) & 0xFFFF
            if top:
                reg ^= 0x1021
    assert ((~reg) & 0xFFFF) == P1_CRC


def test_pcm16x0_golden_crc():
    w = np.array([P16_WORDS], np.int64)
    crc = int(np.asarray(pcm16x0.calc_crc(w, xp=np))[0])
    assert crc == P16_CRC
    # plain CRC-16/CCITT-FALSE over 3x16-bit words
    reg = 0xFFFF
    for word in P16_WORDS:
        for bit in range(15, -1, -1):
            inbit = (word >> bit) & 1
            top = ((reg >> 15) ^ inbit) & 1
            reg = (reg << 1) & 0xFFFF
            if top:
                reg ^= 0x1021
    assert reg == P16_CRC


def test_pcm1_sample_expansion_literals():
    got = np.asarray(pcm1.expand_sample(np.array(P1_WORDS, np.int64),
                                        xp=np))
    assert list(got) == [-5932, 2336, -8816, 4076, -4040, -25424]


def test_pcm1_golden_capture_to_wav_bytes(tmp_path):
    """A field of golden PCM-1 lines through stitcher -> audio -> WAV:
    the payload must be a 12-byte cycle of EXACTLY the hand-computed
    sample pairs."""
    n_lines = 2 * sp1.LINES_PF      # both fields of one frame
    w = np.tile(np.array(P1_WORDS, np.int64), (n_lines, 1))
    crcs = np.full(n_lines, P1_CRC, np.int64)
    nums = np.concatenate([1 + 2 * np.arange(sp1.LINES_PF),
                           2 + 2 * np.arange(sp1.LINES_PF)])
    store = sp1.PCM1LineStore.from_decoded(
        w, crcs, np.ones(n_lines), nums,
        ref_level=np.full(n_lines, 120))
    tag = sp1.PCM1LineStore(1)
    tag.service[0] = sp1.SRV_NEW_FILE
    tag.frame_number[0] = 1
    stitcher = sp1.PCM1Stitcher()
    stitcher.push_frame(sp1.PCM1LineStore.concat([tag, store]))
    from sdvpcmdecoder_tpu.pipeline.stitcher_stc007 import chunks_to_arrays
    samples, valid, blk, rate = chunks_to_arrays(
        stitcher.pop_sample_chunks())
    assert valid.all()
    out = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD).process(
        samples, valid, blk, file_end=True)

    path = tmp_path / "p1_golden.wav"
    writer = wav.WavWriter(path, 44100)
    writer.write(out)
    writer.close()
    data = path.read_bytes()
    n = len(out)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 4 * n, b"WAVE", b"fmt ", 16, 1, 2, 44100,
        44100 * 4, 4, 16, b"data", 4 * n)
    assert data[:44] == hdr
    body = data[44:]
    assert len(body) == 4 * n and n >= 6
    # Every emitted pair is one of the three hand-computed pairs (the
    # word-pair interleave re-phases at stripe/field boundaries, so the
    # stream is piecewise- rather than globally-periodic), and the three
    # pairs appear in equal numbers.
    pairs = [struct.unpack_from("<2h", body, 4 * k) for k in range(n)]
    assert set(pairs) == P1_PAIRS
    counts = {p: pairs.count(p) for p in P1_PAIRS}
    assert len(set(counts.values())) == 1, counts


def test_pcm16x0_handbuilt_field_to_wav_bytes(tmp_path):
    """A hand-built SI field (three 16-bit literals with XOR parity)
    through stitcher -> audio -> WAV: every output sample must be the
    two's-complement passthrough of a hand literal, the stream periodic."""
    a, b = 0xD527, 0x9C36
    c = a ^ b                       # XOR parity (fixByP rule)
    lit = {v - 0x10000 if v >= 0x8000 else v for v in (a, b, c)}
    LPF = sp16.LINES_PF
    usable = (LPF * 3 // sp16.SI_TRUE_INTERLEAVE) \
        * sp16.SI_TRUE_INTERLEAVE
    # Row group g of each 105-subline super-block holds value [a,b,c][g]
    # in all 3 words; any (L,R,P) permutation then XORs to zero.
    vals = np.array([a, b, c], np.int64)
    words = np.zeros((usable, 3), np.int64)
    pos = np.arange(usable) % sp16.SI_TRUE_INTERLEAVE
    words[:] = vals[pos // 35][:, None]
    crcs = np.asarray(pcm16x0.calc_crc(words, xp=np))
    store = sp16.PCM16X0LineStore.from_decoded(
        words, crcs, np.ones(usable),
        1 + 2 * (np.arange(usable) // 3),
        np.tile(np.arange(3), usable // 3),
        control_bit=np.ones(usable, bool))
    tag = sp16.PCM16X0LineStore(1)
    tag.service[0] = sp16.SRV_NEW_FILE
    tag.frame_number[0] = 1
    stitcher = sp16.PCM16X0Stitcher()
    stitcher.push_frame(sp16.PCM16X0LineStore.concat([tag, store]))
    from sdvpcmdecoder_tpu.pipeline.stitcher_stc007 import chunks_to_arrays
    samples, valid, blk, rate = chunks_to_arrays(
        stitcher.pop_sample_chunks())
    got = samples[valid.all(axis=-1)]
    assert len(got) > 100
    assert set(np.unique(got)).issubset(lit)
    out = ap.AudioProcessor(mask_mode=ap.DROP_INTER_LIN_WORD).process(
        samples, valid, blk, file_end=True)
    path = tmp_path / "p16_golden.wav"
    writer = wav.WavWriter(path, rate)
    writer.write(out)
    writer.close()
    data = path.read_bytes()
    n = len(out)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 4 * n, b"WAVE", b"fmt ", 16, 1, 2, rate,
        rate * 4, 4, 16, b"data", 4 * n)
    assert data[:44] == hdr
    body = data[44:]
    # The decoded (odd-field) prefix is periodic with the 6-pair
    # (24-byte) block cycle; the empty even field behind it masks to
    # silence and is not part of the anchor.
    n_valid = int(valid.all(axis=-1).sum())
    prefix = body[:4 * n_valid]
    period = 4 * 3 * 35             # one 105-pair super-block
    head = prefix[:period]
    reps = len(prefix) // period
    assert reps >= 5
    assert prefix[:reps * period] == head * reps
