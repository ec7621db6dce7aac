"""Zipformer2 tests: forward shapes/lengths, causal chunked vs full,
simulated streaming, feature-mask training mode (mirrors reference
model/encoder/zipformer_test.py:43-86 coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.models.zipformer import (Zipformer2, Zipformer2Config,
                                              swoosh_l, swoosh_r)

TINY = Zipformer2Config(
    feature_dim=80,
    downsampling_factor=(1, 2, 4),
    num_encoder_layers=(1, 1, 1),
    feedforward_dim=(64, 64, 64),
    encoder_dim=(32, 48, 48),
    encoder_unmasked_dim=(24, 24, 24),
    num_heads=(2, 2, 2),
    query_head_dim=8,
    value_head_dim=8,
    pos_head_dim=4,
    pos_dim=16,
    cnn_module_kernel=(7, 7, 7),
    causal=True,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def setup():
    m = Zipformer2(TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 103, 80))
    lens = jnp.array([103, 57])
    params = m.init({"params": jax.random.PRNGKey(1)}, x, lens)["params"]
    return m, x, lens, params


def test_forward_shapes_and_lengths(setup):
    m, x, lens, params = setup
    out, out_lens = m.apply({"params": params}, x, lens)
    assert out.shape[-1] == max(TINY.encoder_dim)
    # frontend (T−7)//2 − 1 then ×2 output downsample
    exp0 = -(-((103 - 7) // 2 - 1) // 2)
    assert int(out_lens[0]) == exp0
    assert out.shape[1] >= int(out_lens[0])
    # padding zeroed
    pad = np.asarray(out[1, int(out_lens[1]):])
    assert np.abs(pad).sum() == 0.0


def test_chunked_vs_full_differ(setup):
    m, x, lens, params = setup
    full, _ = m.apply({"params": params}, x, lens)
    chunked, _ = m.apply({"params": params}, x, lens,
                         chunk_size=jnp.asarray(8, jnp.int32),
                         left_context_chunks=jnp.asarray(1, jnp.int32))
    assert not np.allclose(np.asarray(full), np.asarray(chunked), atol=1e-3)


def test_simulated_streaming_runs(setup):
    m, x, lens, params = setup
    out, out_lens = m.apply({"params": params}, x, lens,
                            method=Zipformer2.streaming_forward)
    assert out.shape[-1] == max(TINY.encoder_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_training_mode_feature_mask(setup):
    m, x, lens, params = setup
    out, _ = m.apply({"params": params}, x, lens, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(out)).all()


def test_swoosh_activations():
    x = jnp.linspace(-6, 6, 100)
    l, r = swoosh_l(x), swoosh_r(x)
    assert np.isfinite(np.asarray(l)).all()
    # SwooshL(0) ≈ −0.017, SwooshR(0) ≈ 0 (paper values)
    assert abs(float(swoosh_l(jnp.array(0.0)))) < 0.02
    assert abs(float(swoosh_r(jnp.array(0.0)))) < 0.01


def test_gradients_flow(setup):
    m, x, lens, params = setup

    def f(p):
        out, _ = m.apply({"params": p}, x, lens)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(params)
    total = sum(float(jnp.abs(v).sum())
                for v in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_nonlin_attention_all_chunks_live():
    """All three in_proj chunks (s, a, b) must affect the output — the
    reference gates post-attention with the third chunk
    (zipformer.py:2455-2478), not tanh(s)."""
    from speech2text_tpu.models.zipformer import NonlinAttention

    B, T, D, H = 2, 6, 16, 12
    m = NonlinAttention(embed_dim=D, hidden=H)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, T, T)),
                       axis=-1)
    params = m.init(jax.random.PRNGKey(2), x, w)["params"]
    base = m.apply({"params": params}, x, w)

    kernel = np.asarray(params["in_proj"]["kernel"])  # (D, 3H)
    for chunk in range(3):
        k2 = kernel.copy()
        k2[:, chunk * H:(chunk + 1) * H] *= -1.0  # perturb one chunk
        p2 = jax.tree.map(lambda v: v, params)
        p2["in_proj"]["kernel"] = jnp.asarray(k2)
        out2 = m.apply({"params": p2}, x, w)
        assert not np.allclose(np.asarray(base), np.asarray(out2),
                               atol=1e-5), f"in_proj chunk {chunk} is dead"


def test_nonlin_attention_step_matches_forward():
    from speech2text_tpu.models.zipformer import NonlinAttention

    B, T, D, H = 2, 8, 16, 12
    m = NonlinAttention(embed_dim=D, hidden=H)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (B, T, T)), axis=-1)
    params = m.init(jax.random.PRNGKey(2), x, w)["params"]
    full = m.apply({"params": params}, x, w)
    # step with zero left context over the whole sequence reproduces forward
    cached = jnp.zeros((B, 0, H))
    out_step, _ = m.apply({"params": params}, x, w, cached,
                            method=NonlinAttention.step)
    np.testing.assert_allclose(np.asarray(full), np.asarray(out_step),
                               atol=1e-5)


def test_scan_layers_equivalence(setup):
    """scan_layers=True computes the same function as the unrolled form
    given layout-converted params (and the layouts round-trip)."""
    import dataclasses

    from speech2text_tpu.models.zipformer import (stack_layer_params,
                                                  unstack_layer_params)
    m, x, lens, params = setup
    cfg2 = dataclasses.replace(TINY, num_encoder_layers=(2, 2, 2),
                               scan_layers=False)
    m_loop = Zipformer2(cfg2)
    p_loop = m_loop.init({"params": jax.random.PRNGKey(3)}, x,
                         lens)["params"]
    y_loop, l_loop = m_loop.apply({"params": p_loop}, x, lens)

    m_scan = Zipformer2(dataclasses.replace(cfg2, scan_layers=True))
    p_scan = stack_layer_params(p_loop)
    # shape sanity: scanned init produces the same tree structure
    p_init = m_scan.init({"params": jax.random.PRNGKey(4)}, x,
                         lens)["params"]
    assert (jax.tree_util.tree_structure(p_init)
            == jax.tree_util.tree_structure(p_scan))
    y_scan, l_scan = m_scan.apply({"params": p_scan}, x, lens)
    np.testing.assert_array_equal(np.asarray(l_loop), np.asarray(l_scan))
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan),
                               rtol=2e-5, atol=2e-5)

    # round-trip back to the unrolled layout
    p_back = unstack_layer_params(p_scan)
    y_back, _ = m_loop.apply({"params": p_back}, x, lens)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_back),
                               rtol=1e-6, atol=1e-6)


def test_remat_dynamics_traced_step_grad():
    """remat + icefall dynamics + traced global-step compose (both layer
    layouts): the nn.remat static_argnums choice must not capture the
    traced `step` scalar."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, downsampling_factor=(1, 2), num_encoder_layers=(2, 2),
        feedforward_dim=(64, 64), encoder_dim=(32, 48),
        encoder_unmasked_dim=(24, 24), num_heads=(2, 2),
        cnn_module_kernel=(7, 7), dropout=0.1, remat=True, dynamics=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 51, 80))
    lens = jnp.array([51, 37])
    for scan in (False, True):
        m = Zipformer2(dataclasses.replace(cfg, scan_layers=scan))
        p = m.init({"params": jax.random.PRNGKey(1)}, x, lens)["params"]

        def loss(pp, step, m=m):
            y, _ = m.apply({"params": pp}, x, lens, deterministic=False,
                           step=step, rngs={"dropout": jax.random.PRNGKey(2)})
            return (y.astype(jnp.float32) ** 2).mean()

        g = jax.grad(loss)(p, jnp.asarray(100.0))
        total = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0)
        assert np.isfinite(total) and total > 0


def test_remat_policy_dots_grad_parity(setup):
    """Selective remat (remat_policy="dots": save matmul outputs + the
    named attention weights, recompute elementwise) must be a pure memory
    schedule change — loss and grads identical to the no-remat path."""
    import dataclasses
    m0, x, lens, params = setup

    def loss_fn(m):
        def f(p):
            y, _ = m.apply({"params": p}, x, lens)
            return (y.astype(jnp.float32) ** 2).mean()
        return f

    l0, g0 = jax.value_and_grad(loss_fn(m0))(params)
    md = Zipformer2(dataclasses.replace(TINY, remat=True,
                                        remat_policy="dots"))
    ld, gd = jax.value_and_grad(loss_fn(md))(params)
    np.testing.assert_allclose(float(l0), float(ld), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # scan-over-layers branch (needs >1 layer per stack to engage)
    cfg2 = dataclasses.replace(
        TINY, downsampling_factor=(1, 2), num_encoder_layers=(2, 2),
        feedforward_dim=(64, 64), encoder_dim=(32, 48),
        encoder_unmasked_dim=(24, 24), num_heads=(2, 2),
        cnn_module_kernel=(7, 7), scan_layers=True)
    ms = Zipformer2(cfg2)
    ps = ms.init({"params": jax.random.PRNGKey(7)}, x, lens)["params"]
    ls, gs = jax.value_and_grad(loss_fn(ms))(ps)
    msd = Zipformer2(dataclasses.replace(cfg2, remat=True,
                                         remat_policy="dots"))
    lsd, gsd = jax.value_and_grad(loss_fn(msd))(ps)
    np.testing.assert_allclose(float(ls), float(lsd), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gsd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_remat_policy_typo_rejected(setup):
    """A remat_policy typo ("dot", "Dots", ...) must raise, not silently
    fall back to full remat (same strictness as from_dict unknown-key
    validation)."""
    import dataclasses
    _, x, lens, params = setup
    for bad in ("dot", "Dots", "none"):
        m = Zipformer2(dataclasses.replace(TINY, remat=True,
                                           remat_policy=bad))
        with pytest.raises(ValueError, match="remat_policy"):
            m.apply({"params": params}, x, lens)


def test_score_dtype_bf16_close_to_f32(setup):
    """score_dtype="bfloat16" only changes the dtype the two score
    einsums write (clip/mask/softmax stay f32); the encoder output must
    stay close to the f32 path, and the param tree must be identical."""
    import dataclasses
    m, x, lens, params = setup
    m16 = Zipformer2(dataclasses.replace(TINY, score_dtype="bfloat16"))
    out32, l32 = m.apply({"params": params}, x, lens)
    out16, l16 = m16.apply({"params": params}, x, lens)
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    denom = np.abs(np.asarray(out32)).max() + 1e-9
    rel = np.abs(np.asarray(out32) - np.asarray(out16)).max() / denom
    assert rel < 3e-2, rel
