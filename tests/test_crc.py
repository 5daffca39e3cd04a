"""CRC-16 golden tests against the reference's self-test vectors
(pcmtester.cpp:9-99) plus randomized scalar-vs-matmul cross-checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from sdvpcmdecoder_tpu.formats import crc, stc007, pcm1, pcm16x0


def test_crc16_check_value():
    # CRC-16/CCITT-FALSE check: "123456789" -> 0x29B1 (pcmline.h:88-91).
    c = crc.CRC_INIT
    for ch in b"123456789":
        c = crc.crc16_update_scalar(c, ch, 8)
    assert c == 0x29B1


def test_stc007_crc_golden():
    # pcmtester.cpp:68-99: 8 x 14-bit words -> CRC 0xB2ED.
    words = [0x2D4B, 0x18EE, 0x152B, 0x3A7F, 0x04AB, 0x301B, 0x22F6, 0x0DD6]
    assert crc.crc16_words_scalar(words, 14) == 0xB2ED
    w = jnp.asarray([words], dtype=jnp.int32)
    assert int(stc007.calc_crc(w)[0]) == 0xB2ED
    assert int(stc007.calc_crc(np.asarray([words]), xp=np)[0]) == 0xB2ED


def test_stc007_silent_crc():
    w = jnp.asarray([stc007.silent_words()], dtype=jnp.int32)
    assert int(stc007.calc_crc(w)[0]) == stc007.CRC_SILENT  # 0xA96A


def test_pcm1_crc_golden():
    # pcmtester.cpp:9-37: 6 x 13-bit words -> CRC 0x9EB9 (inverted scheme).
    words = [0x1A35, 0x1248, 0x0DD9, 0x13FB, 0x1C0E, 0x09CB]
    inv = [(~w) & pcm1.DATA_WORD_MASK for w in words]
    ref = (~crc.crc16_words_scalar(inv, 13)) & 0xFFFF
    assert ref == 0x9EB9
    w = jnp.asarray([words], dtype=jnp.int32)
    assert int(pcm1.calc_crc(w)[0]) == 0x9EB9


def test_pcm1_silent_crc():
    w = jnp.asarray([pcm1.silent_words()], dtype=jnp.int32)
    assert int(pcm1.calc_crc(w)[0]) == pcm1.CRC_SILENT  # 0xECBF


def test_pcm16x0_crc_golden():
    # pcmtester.cpp:40-65: 3 x 16-bit words -> CRC 0xFB40.
    words = [0xD527, 0x9C36, 0x02A5]
    assert crc.crc16_words_scalar(words, 16) == 0xFB40
    w = jnp.asarray([words], dtype=jnp.int32)
    assert int(pcm16x0.calc_crc(w)[0]) == 0xFB40


def test_pcm16x0_silent_crc():
    w = jnp.asarray([pcm16x0.silent_words()], dtype=jnp.int32)
    assert int(pcm16x0.calc_crc(w)[0]) == pcm16x0.CRC_SILENT  # 0x0E10


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_crc_matmul_matches_scalar_random(seed):
    rng = np.random.default_rng(seed)
    words = rng.integers(0, 1 << 14, size=(64, 8))
    expect = np.array([crc.crc16_words_scalar(row, 14) for row in words])
    got = np.asarray(stc007.calc_crc(jnp.asarray(words, dtype=jnp.int32)))
    np.testing.assert_array_equal(got, expect)
    got_np = stc007.calc_crc(words, xp=np)
    np.testing.assert_array_equal(got_np, expect)


def test_syndrome_table_zero_iff_valid():
    rng = np.random.default_rng(3)
    words = rng.integers(0, 1 << 14, size=(32, 8)).astype(np.int64)
    good_crc = stc007.calc_crc(words, xp=np)
    bad_crc = good_crc ^ 0x0040
    table, const = stc007.crc_syndrome_table()
    for crcs, expect_zero in ((good_crc, True), (bad_crc, False)):
        bits = stc007.words_to_data_bits(words, crcs, xp=np)
        synd_bits = (bits.astype(np.int64) @ table.astype(np.int64)) & 1
        weights = (1 << np.arange(16)).astype(np.int64)
        synd = (synd_bits * weights).sum(axis=-1) ^ const
        if expect_zero:
            assert np.all(synd == 0)
        else:
            assert np.all(synd != 0)


def test_bits_roundtrip():
    rng = np.random.default_rng(4)
    words = rng.integers(0, 1 << 14, size=(16, 8)).astype(np.int64)
    crcs = stc007.calc_crc(words, xp=np)
    bits = stc007.words_to_data_bits(words, crcs, xp=np)
    assert bits.shape == (16, 128)
    w2, c2 = stc007.data_bits_to_words(bits, xp=np)
    np.testing.assert_array_equal(w2, words)
    np.testing.assert_array_equal(c2, crcs)


def test_sample_expansion_stc007():
    w = jnp.asarray([0, 1, 0x1FFF, 0x2000, 0x3FFF], dtype=jnp.int32)
    s = stc007.expand_sample(w)
    np.testing.assert_array_equal(
        np.asarray(s), [0, 4, 0x7FFC, -32768, -4])
    # M2 companded mode (stc007line.cpp:299-323).
    m = stc007.expand_sample(w, m2=True)
    # 0: high range 0<<3 = 0 ; 1 -> 8 ; 0x1FFF -> 0xFFF8 = -8
    assert int(m[0]) == 0 and int(m[1]) == 8 and int(m[2]) == -8
    # 0x2000: range bit set, sign clear -> low range value 0
    assert int(m[3]) == 0
    # 0x3FFF: range bit set, sign set -> negative, all MSBs filled
    assert int(m[4]) == -1


def test_sample_expansion_pcm1():
    w = jnp.asarray([0, 1, 0x0FFF, 0x1000, 0x17FF, 0x1800, 0x1FFF],
                    dtype=jnp.int32)
    s = pcm1.expand_sample(w)
    # High range is word<<4 cast to int16 (pcm1line.cpp:205-210), so
    # 0x0FFF -> 0xFFF0 -> -16; low range 0x1800 -> 0x2000|0xC000 -> -8192.
    np.testing.assert_array_equal(
        np.asarray(s), [0, 16, -16, 0, 0x1FFC, -8192, -4])
