import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kidney_diffusion_tpu.kernels.attention import attention, xla_attention


def _qkv(b=2, nq=2048, nk=2048, h=2, d=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, nq, h, d), dtype)
    k = jax.random.normal(ks[1], (b, nk, h, d), dtype)
    v = jax.random.normal(ks[2], (b, nk, h, d), dtype)
    return q, k, v


def test_pallas_matches_xla_self_attention():
    q, k, v = _qkv()
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_matches_xla_with_context_tokens():
    # keys longer than queries and NOT lane-aligned (4099 = 4096 + 3 ctx)
    q, k, v = _qkv(b=1, nq=2048, nk=2051, h=2)
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_unaligned_queries():
    q, k, v = _qkv(b=1, nq=2100, nk=2100, h=1)
    # nq < 128 block multiple -> padded internally
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_small_shapes_fall_back_to_xla():
    q, k, v = _qkv(b=1, nq=64, nk=64, h=2, d=32)
    got = attention(q, k, v)  # nq < BQ -> xla path, must not crash
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    ref = xla_attention(q, k, v)
    got = attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
