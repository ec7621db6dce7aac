"""Fused zipformer attention-WEIGHTS kernel (Pallas, interpret on CPU) vs
the materialized-weights XLA oracle: forward weights AND gradients, with
and without chunk masks, bf16/f32 weight dtypes, padded-tail isolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.ops.pallas.flash_attn import xla_weights, zip_weights


def make_inputs(B=2, T=37, H=2, qd=8, pd=4, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, T, H, qd), dtype)
    k = jax.random.normal(ks[1], (B, T, H, qd), dtype)
    qp = jax.random.normal(ks[2], (B, T, H, pd), dtype)
    p = jax.random.normal(ks[3], (2 * T - 1, H, pd), dtype)
    return q, k, qp, p


def chunk_mask(B, T, chunk=8):
    t = np.arange(T)
    m = (t[None, :] // chunk) <= (t[:, None] // chunk)
    return jnp.asarray(np.broadcast_to(m, (B, T, T)))


@pytest.mark.parametrize("mask", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_oracle(mask, dtype):
    q, k, qp, p = make_inputs(dtype=dtype)
    B, T = q.shape[:2]
    m = chunk_mask(B, T) if mask else None
    got = zip_weights(q, k, qp, p, m, w_dtype=dtype)
    want = xla_weights(q, k, qp, p, m, None, dtype)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)
    # rows sum to 1 and masked slots are exactly zero
    w = np.asarray(got, np.float32)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=2e-2)
    if mask:
        assert (w[~np.asarray(m)[:, None].repeat(q.shape[2], 1)] == 0).all()


@pytest.mark.parametrize("T", [29, 128, 131])
def test_tile_boundaries(T):
    """T below/at/above the 128-row query tile — edge blocks must clip."""
    q, k, qp, p = make_inputs(T=T)
    B = q.shape[0]
    m = chunk_mask(B, T, chunk=16)
    got = zip_weights(q, k, qp, p, m, w_dtype=jnp.float32)
    want = xla_weights(q, k, qp, p, m, None, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_oracle():
    q, k, qp, p = make_inputs(T=29, dtype=jnp.float32)
    B, T = q.shape[:2]
    m = chunk_mask(B, T, chunk=8)

    def loss_flash(q, k, qp, p):
        w = zip_weights(q, k, qp, p, m, w_dtype=jnp.float32)
        return jnp.sum(jnp.sin(w) * jnp.cos(w * 0.5))

    def loss_oracle(q, k, qp, p):
        w = xla_weights(q, k, qp, p, m, None, jnp.float32)
        return jnp.sum(jnp.sin(w) * jnp.cos(w * 0.5))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, qp, p)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, qp, p)
    for a, b, name in zip(gf, go, ["dq", "dk", "dqp", "dp"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_gradients_no_mask():
    q, k, qp, p = make_inputs(T=21)

    def lf(fn):
        def loss(q, k, qp, p):
            w = fn(q, k, qp, p)
            # bounded, position-dependent cotangents (large cotangents
            # amplify benign f32 association-order differences)
            ct = jnp.cos(jnp.arange(w.size, dtype=jnp.float32) * 0.37)
            return jnp.sum(w * ct.reshape(w.shape))
        return loss

    gf = jax.grad(lf(lambda *a: zip_weights(*a, None,
                                            w_dtype=jnp.float32)),
                  argnums=(0, 1, 2, 3))(q, k, qp, p)
    go = jax.grad(lf(lambda *a: xla_weights(*a, None, None, jnp.float32)),
                  argnums=(0, 1, 2, 3))(q, k, qp, p)
    for a, b, name in zip(gf, go, ["dq", "dk", "dqp", "dp"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_padded_tail_is_ignored():
    """Keys beyond a mask's valid length must not leak: changing k at
    masked positions changes neither weights nor gradients."""
    q, k, qp, p = make_inputs(T=19)
    B, T = q.shape[:2]
    L = 13
    m = jnp.broadcast_to(jnp.arange(T)[None, :] < L, (T, T))
    m = jnp.broadcast_to(m, (B, T, T))
    w1 = zip_weights(q, k, qp, p, m, w_dtype=jnp.float32)
    k2 = k.at[:, L:].set(99.0)
    w2 = zip_weights(q, k2, qp, p, m, w_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)
    # masked keys receive zero gradient
    g = jax.grad(lambda kk: jnp.sum(
        zip_weights(q, kk, qp, p, m, w_dtype=jnp.float32) ** 2))(k)
    assert float(jnp.abs(g[:, L:]).max()) == 0.0


def test_bf16_inputs_gradients_run():
    """bf16 q/k/qp/p (the flagship encoder dtype): grads must flow with
    matching dtypes (regression: t_vjp cotangent dtype mismatch)."""
    q, k, qp, p = make_inputs(T=19, dtype=jnp.bfloat16)
    B, T = q.shape[:2]
    m = chunk_mask(B, T, chunk=8)
    g = jax.grad(lambda *a: jnp.sum(
        zip_weights(*a, m, w_dtype=jnp.bfloat16).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3))(q, k, qp, p)
    for t, x in zip(g, (q, k, qp, p)):
        assert t.dtype == x.dtype
        assert bool(jnp.isfinite(t.astype(jnp.float32)).all())
