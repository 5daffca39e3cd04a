"""Consistency checks for the transcribed Q-code GF(2) matrix tables
(stc007deinterleaver.cpp:4-75) — algebraic identities catch transcription
errors without needing the original binary."""
import numpy as np
import jax.numpy as jnp
import pytest

from sdvpcmdecoder_tpu.formats import gf2


def test_identity():
    np.testing.assert_array_equal(gf2.tpow(0), np.eye(14, dtype=np.uint8))


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6])
def test_t_inverse(k):
    prod = gf2.matmul_gf2(gf2.tpow(k), gf2.tpow(-k))
    np.testing.assert_array_equal(prod, np.eye(14, dtype=np.uint8))


@pytest.mark.parametrize("a,b", [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3),
                                 (1, 5), (2, 4), (-1, 2), (-2, 5), (-3, 6)])
def test_t_power_composition(a, b):
    prod = gf2.matmul_gf2(gf2.tpow(a), gf2.tpow(b))
    np.testing.assert_array_equal(prod, gf2.tpow(a + b))


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5])
def test_tk_plus_i_inverse(k):
    tk_i = (gf2.tpow(k) ^ np.eye(14, dtype=np.uint8))
    prod = gf2.matmul_gf2(gf2.tk_plus_i_inv(k), tk_i)
    np.testing.assert_array_equal(prod, np.eye(14, dtype=np.uint8))


def test_apply_matches_scalar():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 14, size=(32,))
    for k in (-6, -3, 1, 4, 6):
        m = gf2.tpow(k)
        expect = np.array([gf2.mat_apply_scalar(m, int(w)) for w in words])
        got = np.asarray(gf2.apply_gf2(m, jnp.asarray(words, jnp.int32)))
        np.testing.assert_array_equal(got, expect)
        got_np = gf2.apply_gf2(m, words, xp=np)
        np.testing.assert_array_equal(got_np, expect)


def test_apply_indexed():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 1 << 14, size=(16,))
    bank = [gf2.tpow(1), gf2.tpow(2), gf2.tpow(-1)]
    idx = rng.integers(0, 3, size=(16,))
    expect = np.array([gf2.mat_apply_scalar(bank[i], int(w))
                       for i, w in zip(idx, words)])
    got = np.asarray(gf2.apply_gf2_indexed(
        bank, jnp.asarray(idx), jnp.asarray(words, jnp.int32)))
    np.testing.assert_array_equal(got, expect)
