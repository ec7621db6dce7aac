"""Fused zipformer attention (Pallas, interpret on CPU) vs the
materialized-weights XLA oracle: forward values AND gradients, with and
without chunk masks, const-attention rows, bf16/f32 weight dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.ops.pallas.flash_attn import (xla_weights, zip_attend,
                                                   _xla_attend)


def make_inputs(B=2, T=37, H=2, qd=8, pd=4, vd=6, dtype=jnp.float32,
                seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (B, T, H, qd), dtype)
    k = jax.random.normal(ks[1], (B, T, H, qd), dtype)
    qp = jax.random.normal(ks[2], (B, T, H, pd), dtype)
    p = jax.random.normal(ks[3], (2 * T - 1, H, pd), dtype)
    v = jax.random.normal(ks[4], (B, T, H, vd), dtype)
    return q, k, qp, p, v


def chunk_mask(B, T, chunk=8):
    t = np.arange(T)
    m = (t[None, :] // chunk) <= (t[:, None] // chunk)
    return jnp.asarray(np.broadcast_to(m, (B, T, T)))


@pytest.mark.parametrize("mask", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_oracle(mask, dtype):
    q, k, qp, p, v = make_inputs(dtype=dtype)
    B, T = q.shape[:2]
    m = chunk_mask(B, T) if mask else None
    w_dtype = dtype
    got = zip_attend(q, k, qp, p, v, m, w_dtype=w_dtype)
    want = _xla_attend(q, k, qp, p, v, m,
                       jnp.zeros((B,), bool), w_dtype)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


def test_const_rows_are_uniform_over_allowed():
    q, k, qp, p, v = make_inputs(B=3, T=21)
    B, T = q.shape[:2]
    m = chunk_mask(B, T, chunk=4)
    const = jnp.asarray([True, False, True])
    got = zip_attend(q, k, qp, p, v, m, const_row=const,
                     w_dtype=jnp.float32)
    w = xla_weights(q, k, qp, p, m, const, jnp.float32)
    want = jnp.einsum("bhts,bshd->bthd", w, v,
                      preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # const row 0 weights really are uniform over the allowed set
    w0 = np.asarray(w[0, 0])
    allowed = np.asarray(m[0])
    expect = allowed / allowed.sum(-1, keepdims=True)
    np.testing.assert_allclose(w0, expect, atol=1e-6)


def test_gradients_match_oracle():
    q, k, qp, p, v = make_inputs(T=29, dtype=jnp.float32)
    B, T = q.shape[:2]
    m = chunk_mask(B, T, chunk=8)
    zeros = jnp.zeros((B,), bool)

    def loss_flash(q, k, qp, p, v):
        o = zip_attend(q, k, qp, p, v, m, w_dtype=jnp.float32)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_oracle(q, k, qp, p, v):
        o = _xla_attend(q, k, qp, p, v, m, zeros, jnp.float32)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, qp, p, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(q, k, qp, p, v)
    for a, b, name in zip(gf, go, ["dq", "dk", "dqp", "dp", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_padded_tail_is_ignored():
    """Cols beyond a mask's valid length must not leak into outputs:
    changing k/v at masked positions changes nothing."""
    q, k, qp, p, v = make_inputs(T=19)
    B, T = q.shape[:2]
    L = 13
    m = jnp.broadcast_to(jnp.arange(T)[None, :] < L, (T, T))
    m = jnp.broadcast_to(m, (B, T, T))
    o1 = zip_attend(q, k, qp, p, v, m, w_dtype=jnp.float32)
    k2 = k.at[:, L:].set(99.0)
    v2 = v.at[:, L:].set(-77.0)
    o2 = zip_attend(q, k2, qp, p, v2, m, w_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
