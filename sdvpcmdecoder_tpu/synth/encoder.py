"""Synthetic STC-007 encoder: samples -> interleaved lines -> pixel frames.

The reference has no encoder; this is the inverse of its decode chain,
used as the conformance fixture (SURVEY.md section 7 step 2):
  samples -> data blocks (P/Q codes per stc007deinterleaver.cpp:1296-1317)
          -> diagonal interleave (word w of the block at line b lands in
             line b + 16*w, stc007datablock.h:38-59)
          -> per-line CRC (stc007line.cpp:245-257)
          -> 137-bit line (START 1010 + 128 data + STOP 01111)
          -> grayscale pixels at a chosen pixels-per-bit.
"""
from __future__ import annotations

import numpy as np

from ..formats import stc007, gf2


def pq_codes(audio_words: np.ndarray):
    """P and Q words for blocks [..., 6] of 14-bit audio words."""
    p = np.bitwise_xor.reduce(audio_words, axis=-1)
    q = np.zeros(audio_words.shape[:-1], dtype=audio_words.dtype)
    for k in range(6):
        q ^= gf2.apply_gf2(gf2.tpow(6 - k), audio_words[..., k], xp=np)
    return p, q


def samples_to_blocks(left: np.ndarray, right: np.ndarray):
    """14-bit sample words -> block word matrix [Nb, 8] (pads with silence).

    Block b carries stereo pairs 3b..3b+2 (L0,R0,L1,R1,L2,R2 word order,
    stc007datablock.h:61-73).
    """
    n = len(left)
    nb = (n + 2) // 3
    pad = nb * 3 - n
    l = np.concatenate([left, np.zeros(pad, dtype=left.dtype)])
    r = np.concatenate([right, np.zeros(pad, dtype=right.dtype)])
    blocks = np.zeros((nb, 8), dtype=np.int64)
    blocks[:, 0] = l[0::3]
    blocks[:, 1] = r[0::3]
    blocks[:, 2] = l[1::3]
    blocks[:, 3] = r[1::3]
    blocks[:, 4] = l[2::3]
    blocks[:, 5] = r[2::3]
    blocks[:, 6], blocks[:, 7] = pq_codes(blocks[:, :6])
    return blocks


def samples_to_blocks16(left: np.ndarray, right: np.ndarray):
    """16-bit (PCM-F1 EE) sample words -> 16-bit block matrix [Nb, 8].

    Columns 0..5 audio, 6 = P16 (XOR of the six 16-bit words; XOR is
    bitwise so its high/low split is consistent), 7 = zero placeholder —
    the S word is per LINE, built by blocks_to_lines for resolution 16.
    """
    n = len(left)
    nb = (n + 2) // 3
    pad = nb * 3 - n
    l = np.concatenate([left, np.zeros(pad, dtype=left.dtype)])
    r = np.concatenate([right, np.zeros(pad, dtype=right.dtype)])
    blocks = np.zeros((nb, 8), dtype=np.int64)
    blocks[:, 0] = l[0::3]
    blocks[:, 1] = r[0::3]
    blocks[:, 2] = l[1::3]
    blocks[:, 3] = r[1::3]
    blocks[:, 4] = l[2::3]
    blocks[:, 5] = r[2::3]
    blocks[:, 6] = np.bitwise_xor.reduce(blocks[:, :6], axis=1)
    return blocks


def blocks_to_lines(blocks: np.ndarray, n_lines: int | None = None,
                    resolution: int = 14):
    """Interleave blocks into per-line word arrays [L, 8] + CRCs [L].

    Line s, tap w carries word w of block (s - 16*w); out-of-range blocks
    are silent. Default L = Nb + 112 so every block is fully covered.
    With resolution=16 the block table holds 16-bit words; each line slot
    keeps the 14 MSBs and slot 7 becomes the per-LINE S word packing the
    2 LSBs of the line's own 7 words at F1_S_OFFSETS
    (stc007deinterleaver.cpp:1195-1274).
    """
    nb = blocks.shape[0]
    if n_lines is None:
        n_lines = nb + stc007.MIN_DEINT_DATA
    # Extend block table with silent blocks on both sides.
    silent = np.zeros((1, 8), dtype=blocks.dtype)
    ext = np.concatenate(
        [np.repeat(silent, stc007.MIN_DEINT_DATA, axis=0), blocks,
         np.repeat(silent, max(0, n_lines - nb), axis=0)], axis=0)
    s = np.arange(n_lines)
    taps = np.arange(8) * stc007.INTERLEAVE_OFS
    # line s tap w -> block index s - 16w, shifted by the 112 silent pad.
    bidx = s[:, None] - taps[None, :] + stc007.MIN_DEINT_DATA
    line_words = ext[bidx, np.arange(8)[None, :]]
    if resolution == 16:
        w16 = line_words
        line_words = w16 >> stc007.F1_WORD_OFS
        line_words[:, 7] = 0
        for k, sh in enumerate(stc007.F1_S_OFFSETS):
            line_words[:, 7] |= (w16[:, k] & stc007.F1_S_MASK) << sh
    crcs = stc007.calc_crc(line_words, xp=np)
    return line_words, crcs


def render_lines(line_words: np.ndarray, crcs: np.ndarray, width: int = 1280,
                 ppb: float = 8.0, start_px: int = 32, black: int = 20,
                 white: int = 200, noise_sigma: float = 0.0,
                 rng: np.random.Generator | None = None):
    """Render lines to grayscale pixels [L, W] uint8 + analytic coords.

    Bit cell i spans pixels [start_px + i*ppb, start_px + (i+1)*ppb).
    Returns (pixels, data_start, data_stop) where the coords follow the
    reference convention (stc007line.cpp:219-223): they span START marker
    bit 1 through one empty bit cell past the data (132 bit cells).
    """
    bits = stc007.line_bits(line_words, crcs, xp=np)  # [L, 137]
    L = bits.shape[0]
    px = np.arange(width)
    cell = np.floor((px - start_px) / ppb).astype(np.int64)
    in_data = (cell >= 0) & (cell < stc007.BITS_IN_LINE)
    cell_c = np.clip(cell, 0, stc007.BITS_IN_LINE - 1)
    vals = np.where(bits[:, cell_c] != 0, white, black).astype(np.float64)
    vals = np.where(in_data[None, :], vals, float(black))
    if noise_sigma > 0:
        rng = rng or np.random.default_rng(0)
        vals = vals + rng.normal(0.0, noise_sigma, size=vals.shape)
    pixels = np.clip(np.round(vals), 0, 255).astype(np.uint8)
    data_start = int(round(start_px + 1 * ppb))
    data_stop = int(round(start_px + 133 * ppb))
    coords = np.tile(np.array([[data_start, data_stop]], dtype=np.int32),
                     (L, 1))
    return pixels, coords


def render_bits(bits: np.ndarray, width=1280, ppb=8.0, start_px=32,
                black=20, white=200, noise_sigma=0.0, rng=None):
    """Generic bit-array renderer: bits [L, nb] -> pixels [L, width].

    Bit cell i spans [start_px + i*ppb, start_px + (i+1)*ppb). Used for
    PCM-1 (94 bits, coords = cell 0 start .. cell 94 start) and PCM-16x0
    (193 bits) synthetic lines.
    """
    L, nb = bits.shape
    px = np.arange(width)
    cell = np.floor((px - start_px) / ppb).astype(np.int64)
    inside = (cell >= 0) & (cell < nb)
    cc = np.clip(cell, 0, nb - 1)
    vals = np.where(bits[:, cc] != 0, white, black).astype(np.float64)
    vals = np.where(inside[None, :], vals, float(black))
    if noise_sigma > 0:
        rng = rng or np.random.default_rng(0)
        vals += rng.normal(0.0, noise_sigma, size=vals.shape)
    pixels = np.clip(np.round(vals), 0, 255).astype(np.uint8)
    data_start = int(round(start_px))
    data_stop = int(round(start_px + nb * ppb))
    return pixels, (data_start, data_stop)


def encode_fields(left, right, n_frames, lines_pf=294, order="tff",
                  first_frame=1, bottom_crop=0, top_crop=0,
                  resolution=14):
    """Field-structured synthetic capture for the stitcher.

    The tape's PCM line sequence is field-sequential: frame f carries
    stream positions [f*2*lpf, (f+1)*2*lpf) as field1 then field2. With
    TFF, field1 is the odd field (line numbers 1,3,5..), field2 even.
    `bottom_crop` removes that many trailing lines from every field and
    `top_crop` leading lines — the capture-cut the stitcher's padding
    search has to detect.

    Returns list of per-frame dicts: frame_number, line_words [N,8],
    crcs [N], line_numbers [N] — lines ordered field1-then-field2 as the
    reference's VIP emits them (vin_ffmpeg.cpp:213 spliceFrame).
    """
    need = n_frames * 2 * lines_pf
    to_blocks = samples_to_blocks16 if resolution == 16 \
        else samples_to_blocks
    blocks = to_blocks(np.asarray(left, np.int64),
                       np.asarray(right, np.int64))
    line_words, crcs = blocks_to_lines(blocks, need,
                                       resolution=resolution)
    frames = []
    for f in range(n_frames):
        fields = []
        for half in range(2):
            base = f * 2 * lines_pf + half * lines_pf
            idx = np.arange(base + top_crop, base + lines_pf - bottom_crop)
            if order == "tff":
                nums = (1 if half == 0 else 2) + 2 * (idx - base)
            else:
                nums = (2 if half == 0 else 1) + 2 * (idx - base)
            fields.append((line_words[idx], crcs[idx], nums))
        frames.append(dict(
            frame_number=first_frame + f,
            line_words=np.concatenate([fl[0] for fl in fields]),
            crcs=np.concatenate([fl[1] for fl in fields]),
            line_numbers=np.concatenate([fl[2] for fl in fields]),
        ))
    return frames


def control_block_line(index=0, hour=0, minute=0, second=0, field=0,
                       m2=False, emphasis=False, copy_prohibited=False,
                       p_enabled=True, q_enabled=True):
    """Control Block line words [8] + CRC (stc007line.h:104-152 layout).

    Inverse of formats.stc007.control_block_fields: cue pattern in the
    first four words, zero ID, packed address/time-code, control flags
    (all active low per stc007line.h:143-152)."""
    words = np.zeros(8, dtype=np.int64)
    words[0] = stc007.CB_CUE1
    words[1] = stc007.CB_CUE2
    words[2] = stc007.CB_CUE1
    words[3] = stc007.CB_CUE2
    words[4] = 0  # ID field, zero for a valid CB
    words[5] = ((index & 0x3F) << 8) | ((hour & 0x0F) << 4) \
        | ((minute >> 2) & 0x0F)
    words[6] = ((minute & 0x03) << 12) | ((second & 0x3F) << 6) \
        | (field & 0x3F)
    ctrl = stc007.CTRL_FMT_M2 if m2 else 0
    if copy_prohibited:
        ctrl |= stc007.CTRL_COPY_MASK
    if not p_enabled:
        ctrl |= stc007.CTRL_EN_P_MASK
    if not q_enabled:
        ctrl |= stc007.CTRL_EN_Q_MASK
    if not emphasis:
        ctrl |= stc007.CTRL_EMPH_MASK
    words[7] = ctrl
    crc = int(stc007.calc_crc(words[None, :], xp=np)[0])
    return words, crc


def encode_stream(left, right, width=1280, ppb=8.0, n_lines=None, **render_kw):
    """samples -> (pixels [L,W], coords [L,2], line_words [L,8], crcs [L])."""
    blocks = samples_to_blocks(np.asarray(left, np.int64),
                               np.asarray(right, np.int64))
    line_words, crcs = blocks_to_lines(blocks, n_lines)
    pixels, coords = render_lines(line_words, crcs, width=width, ppb=ppb,
                                  **render_kw)
    return pixels, coords, line_words, crcs
