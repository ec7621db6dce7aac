"""Gradient-shaper tests (ScheduledFloat, Balancer, Whiten — parity with
reference model/layer/scaling.py behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech2text_tpu.ops.regularizers import (PiecewiseLinear,
                                              ScheduledFloat, balancer,
                                              limit_param_value,
                                              penalize_abs_values_gt,
                                              whiten)


def test_scheduled_float_interp():
    import pytest
    s = ScheduledFloat((0.0, 0.3), (1000.0, 0.1), (2000.0, 0.0))
    assert float(s(0)) == pytest.approx(0.3)
    assert float(s(500)) == pytest.approx(0.2)
    assert float(s(1500)) == pytest.approx(0.05)
    assert float(s(99999)) == pytest.approx(0.0)  # clamps past the end


def test_piecewise_linear_single_point():
    import pytest
    s = PiecewiseLinear((0.0, 0.5))
    assert float(s(123)) == pytest.approx(0.5)


def test_balancer_identity_forward():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(balancer(x)), np.asarray(x))


def test_balancer_steers_negative_channels_up():
    # all-negative channel: fraction positive = 0 < min_positive → extra
    # gradient should push values up (i.e. grad_out < grad_in for loss
    # minimization means d loss/dx decreased)
    x = -jnp.ones((32, 4))
    g = jnp.ones((32, 4))
    _, vjp = jax.vjp(lambda x_: balancer(x_, 0.05, 0.95, 0.2, 100.0, 0.1),
                     x)
    (gx,) = vjp(g)
    # steering reduces the gradient (so SGD increases x)
    assert float(gx.mean()) < float(g.mean())


def test_balancer_magnitude_pressure():
    # tiny-RMS activations get pushed to grow: below min_rms the shaping
    # steers the gradient against sign(x), so SGD increases |x| (the extra
    # gradient scales with |g|, as in the reference scaling.py:782)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 4))
                    * 1e-4, jnp.float32)
    g = jnp.ones((32, 4))
    _, vjp = jax.vjp(lambda x_: balancer(x_, 0.0, 1.0, 0.2, 100.0, 0.1), x)
    (gx,) = vjp(g)
    assert float((gx * jnp.sign(x)).mean()) < float(
        (g * jnp.sign(x)).mean())


def test_whiten_identity_and_gradient_gate():
    rng = np.random.default_rng(1)
    # anisotropic features: one dominant direction → metric >> 1
    base = rng.standard_normal((64, 1)) * np.asarray([[3.0, 0.1, 0.1, 0.1]])
    x = jnp.asarray(base, jnp.float32)
    np.testing.assert_array_equal(np.asarray(whiten(x)), np.asarray(x))
    g = jnp.ones_like(x)
    _, vjp = jax.vjp(lambda x_: whiten(x_, 1.5, 0.1), x)
    (gx,) = vjp(g)
    assert not np.allclose(np.asarray(gx), np.asarray(g))
    # white features: metric ≈ 1 → no extra gradient
    xw = jnp.asarray(rng.standard_normal((4096, 4)), jnp.float32)
    _, vjp = jax.vjp(lambda x_: whiten(x_, 1.5, 0.1), xw)
    (gw,) = vjp(jnp.ones_like(xw))
    np.testing.assert_allclose(np.asarray(gw), 1.0, atol=1e-6)


def test_limit_param_value_straight_through():
    x = jnp.asarray([-2.0, 0.5, 3.0])
    out = limit_param_value(x, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), [-1.0, 0.5, 1.0])
    g = jax.grad(lambda x_: jnp.sum(limit_param_value(x_, -1.0, 1.0)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_penalize_abs_values_gt():
    x = jnp.asarray([0.5, 10.0, -10.0])
    out = penalize_abs_values_gt(x, 5.0, 0.01)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    g = jax.grad(lambda x_: jnp.sum(penalize_abs_values_gt(x_, 5.0,
                                                           0.01)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.01, 0.99], atol=1e-6)


def test_zipformer_with_shapers_trains():
    from speech2text_tpu.models.zipformer import Zipformer2, Zipformer2Config
    cfg = Zipformer2Config(
        downsampling_factor=(1,), num_encoder_layers=(1,),
        feedforward_dim=(32,), encoder_dim=(16,),
        encoder_unmasked_dim=(8,), num_heads=(2,), query_head_dim=4,
        value_head_dim=4, pos_head_dim=2, pos_dim=8,
        cnn_module_kernel=(5,), dropout=0.0, dynamics=True)
    m = Zipformer2(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 41, 80))
    lens = jnp.asarray([41, 30])
    params = m.init({"params": jax.random.PRNGKey(1)}, x, lens)["params"]

    def f(p, step):
        out, _ = m.apply({"params": p}, x, lens, deterministic=False,
                         step=step,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)

    for step in (0, 30000):  # early (strong shaping) and late schedules
        g = jax.grad(f)(params, jnp.asarray(step, jnp.float32))
        total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0
