"""Sony PCM-1600/1610/1630 (EIAJ "PCM-16x0") subline format (data model).

From the reference's PCM16X0SubLine (pcm16x0subline.h:73-125) and
Binarizer::fillPCM16X0 (binarizer.cpp):

  line layout : 193 bits = 3 independent 64-bit sublines + 1 control/skew bit
                at line-bit 128 (between middle and right part):
                  LEFT   bits   0..63
                  MIDDLE bits  64..127
                  CTRL   bit   128
                  RIGHT  bits 129..192
  subline     : 3 x 16-bit words + 16-bit CRC, MSB-first
                (word order R1P1L1, L2P2R2, R3P3L3, CRCC)
  CRC         : CRC-16/CCITT-FALSE over the 3 words (pcm16x0subline.cpp)
  samples     : raw int16 (pcm16x0subline getSample)

Interleave (pcm16x0datablock.h:38-60): SI format offset 35 sublines,
EI (PCM-1630) offset 490 sublines; per-sub-block P parity only.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import crc as crc_mod

BITS_PER_WORD = 16
DATA_WORD_MASK = (1 << BITS_PER_WORD) - 1
BITS_PER_CRC = 16
CRC_WORD_MASK = (1 << BITS_PER_CRC) - 1
BITS_PCM_DATA = BITS_PER_WORD * 3 + BITS_PER_CRC  # 64 per subline
SUBLINES_PER_LINE = 3
BITS_IN_LINE = BITS_PCM_DATA * SUBLINES_PER_LINE + 1  # 193
BITS_LEFT_SHIFT = 34
BITS_RIGHT_SHIFT = 107
CTRL_BIT_INDEX = 2 * BITS_PCM_DATA  # 128: the service/control bit

PART_LEFT, PART_MIDDLE, PART_RIGHT = range(3)
# First line-bit of each part (right part skips the control bit).
PART_START_BIT = (0, BITS_PCM_DATA, 2 * BITS_PCM_DATA + 1)

WORD_R1P1L1, WORD_L2P2R2, WORD_R3P3L3 = range(3)
WORD_CRCC = 3
N_WORDS = 3

CRC_SILENT = 0x0E10  # silent (all-zero) subline CRC (pcm16x0subline.h:104)

# Interleave parameters (pcm16x0datablock.h:38-60).
SI_INTERLEAVE_OFS = 35
EI_INTERLEAVE_OFS = 490
INT_BLK_PER_FIELD = 7
MIN_DEINT_DATA_SI = SI_INTERLEAVE_OFS * 2
MIN_DEINT_DATA_EI = EI_INTERLEAVE_OFS * 2

_WORD_BIT_COUNTS = [BITS_PER_WORD] * N_WORDS + [BITS_PER_CRC]


def calc_crc(words, xp=jnp):
    """CRC-16 over the 3 data words [..., >=3] (16 bits, MSB-first)."""
    bits = crc_mod.words_to_bits(words[..., :N_WORDS], BITS_PER_WORD, xp=xp)
    if xp is jnp:
        return crc_mod.crc16_batch(bits, N_WORDS * BITS_PER_WORD)
    return crc_mod.crc16_batch_np(bits, N_WORDS * BITS_PER_WORD)


def words_to_data_bits(words, crc, xp=jnp):
    """[..., 3] words + crc -> [..., 64] subline bits."""
    allw = xp.concatenate([words[..., :N_WORDS],
                           crc[..., None].astype(words.dtype)], axis=-1)
    return crc_mod.words_to_bits(allw, _WORD_BIT_COUNTS, xp=xp)


def data_bits_to_words(bits, xp=jnp):
    words = []
    pos = 0
    for nb in _WORD_BIT_COUNTS:
        chunk = bits[..., pos:pos + nb]
        weights = (1 << np.arange(nb - 1, -1, -1)).astype(np.int32)
        words.append(xp.sum(chunk.astype(xp.int32) * weights, axis=-1))
        pos += nb
    return xp.stack(words[:N_WORDS], axis=-1), words[N_WORDS]


def line_bits(subline_words, subline_crcs, ctrl_bit=0, xp=jnp):
    """3 sublines -> full 193-bit video line.

    subline_words [..., 3, 3], subline_crcs [..., 3], ctrl_bit scalar/array.
    """
    parts = [words_to_data_bits(subline_words[..., p, :],
                                subline_crcs[..., p], xp=xp)
             for p in range(SUBLINES_PER_LINE)]
    shape = parts[0].shape[:-1]
    ctrl = xp.broadcast_to(xp.asarray(ctrl_bit, dtype=parts[0].dtype),
                           shape)[..., None]
    return xp.concatenate([parts[0], parts[1], ctrl, parts[2]], axis=-1)


def expand_sample(words, xp=jnp):
    """16-bit words are already int16 samples (pcm16x0subline.cpp)."""
    w = words.astype(xp.int32) & DATA_WORD_MASK
    return xp.where(w >= 0x8000, w - 0x10000, w).astype(xp.int16)


def silent_words(xp=np):
    return xp.zeros((N_WORDS,), dtype=xp.int32)
