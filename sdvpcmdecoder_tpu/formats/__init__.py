"""Data model layer: format constants, CRC, GF(2) algebra, sample expansion."""
from . import crc, gf2, stc007, pcm1, pcm16x0  # noqa: F401

PCM_TYPE_PCM1 = 0
PCM_TYPE_PCM16X0 = 1
PCM_TYPE_STC007 = 2
PCM_TYPE_ARVID = 3
