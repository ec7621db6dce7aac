"""Flash-attention zipformer ≡ materialized-weights zipformer: same params,
same inputs, forward + gradients, causal-chunked and full-attention modes
(the flag changes only the compute path, never the parameters)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.models.zipformer import Zipformer2, Zipformer2Config

TINY = Zipformer2Config(
    feature_dim=80,
    downsampling_factor=(1, 2),
    num_encoder_layers=(1, 1),
    feedforward_dim=(96, 96),
    encoder_dim=(64, 96),
    encoder_unmasked_dim=(48, 48),
    num_heads=(2, 2),
    query_head_dim=8,
    value_head_dim=6,
    pos_head_dim=4,
    pos_dim=12,
    cnn_module_kernel=(7, 7),
    dropout=0.0,
)


def _models(causal):
    cfg = dataclasses.replace(
        TINY, causal=causal,
        chunk_size=(8,) if causal else (-1,),
        left_context_frames=(16,) if causal else (-1,))
    base = Zipformer2(cfg)
    # flash_min_batch=0: force the Pallas kernel at these tiny test
    # batches (the production default 48 would route B=2 back to the
    # materialized path and the parity tests would compare it to itself)
    flash = Zipformer2(dataclasses.replace(cfg, use_flash_attn=True,
                                           flash_min_batch=0))
    return base, flash


@pytest.mark.parametrize("B,expect_kernel", [(2, False), (64, True)])
def test_flash_min_batch_dispatch(B, expect_kernel):
    """With the production flash_min_batch default, small-batch programs
    must trace the materialized path (no pallas_call in the jaxpr) and
    large-batch programs the fused kernel — the measured B≈48 crossover
    (docs/evidence/r4_perf_ab.json) encoded as trace-time dispatch."""
    cfg = dataclasses.replace(TINY, use_flash_attn=True)
    assert cfg.flash_min_batch == 48
    model = Zipformer2(cfg)
    x = jnp.zeros((B, 33, 80))
    lens = jnp.full((B,), 33)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, lens)["params"]
    jaxpr = jax.make_jaxpr(
        lambda p: model.apply({"params": p}, x, lens))(params)
    has_kernel = "pallas_call" in str(jaxpr)
    assert has_kernel == expect_kernel


@pytest.mark.parametrize("causal", [False, True])
def test_forward_equivalence(causal):
    base, flash = _models(causal)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 93, 80))
    lens = jnp.asarray([93, 57])
    params = base.init({"params": jax.random.PRNGKey(1)}, x, lens)["params"]
    ob, lb = base.apply({"params": params}, x, lens)
    of, lf = flash.apply({"params": params}, x, lens)
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lf))
    np.testing.assert_allclose(np.asarray(ob, np.float32),
                               np.asarray(of, np.float32),
                               atol=2e-4, rtol=2e-3)


def test_grad_equivalence():
    base, flash = _models(causal=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 61, 80))
    lens = jnp.asarray([61, 40])
    params = base.init({"params": jax.random.PRNGKey(3)}, x, lens)["params"]

    def loss(m):
        def f(p):
            o, _ = m.apply({"params": p}, x, lens)
            return jnp.mean(jnp.square(o))
        return f

    gb = jax.grad(loss(base))(params)
    gf = jax.grad(loss(flash))(params)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_b:
        other = flat_f[path]
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(other, np.float32),
            atol=5e-5, rtol=5e-3, err_msg=name)


def test_param_tree_identical():
    base, flash = _models(causal=False)
    x = jnp.zeros((1, 33, 80))
    lens = jnp.asarray([33])
    pb = base.init({"params": jax.random.PRNGKey(4)}, x, lens)["params"]
    pf = flash.init({"params": jax.random.PRNGKey(4)}, x, lens)["params"]
    sb = jax.tree.map(lambda a: (a.shape, str(a.dtype)), pb)
    sf = jax.tree.map(lambda a: (a.shape, str(a.dtype)), pf)
    assert sb == sf
