"""Multi-device trajectory parity: the FULL train step (pruned-RNN-T loss →
grads → ScaledAdam) run for K steps on an (data=4, model=2) FSDP+TP mesh
must reproduce the single-device trajectory within float tolerance — the
cheap guard against sharding-induced numeric drift before real multi-chip
hardware exists (the class of bug the reference works around in
callbacks/callbacks.py:100-120, FSDP buffer desync)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from __graft_entry__ import (_build_model, _example_batch, _flagship_config,
                             _tiny_config)
from speech2text_tpu.losses import Loss
from speech2text_tpu.optim import scaled_adam
from speech2text_tpu.parallel.mesh import (MeshConfig, batch_sharding,

                                           make_mesh, replicated,
                                           shard_params)

pytestmark = pytest.mark.mesh

STEPS = 12


def _run_trajectory(data, model_axis, tp=False, fsdp=False,
                    flagship=False, steps=STEPS):
    devices = jax.devices()[:data * model_axis]
    mesh = make_mesh(MeshConfig(data=data, model=model_axis),
                     devices=devices)
    if flagship:
        # full flagship dims (12 layers, dim-changing 192→256 stacks,
        # ds 1/2/4/8/4/2) at short T — the shape class where padding and
        # sharding bugs actually live (uneven T splits across 'data',
        # convert_num_channels between stacks); VERDICT r4 Next #6.
        vocab = 128
        model = _build_model(_flagship_config(vocab))
        B = 8
        feats, lens, labels, lab_lens = _example_batch(B, 48, 8, vocab,
                                                       seed=5)
    else:
        vocab = 64
        model = _build_model(_tiny_config(vocab))
        B = 8
        feats, lens, labels, lab_lens = _example_batch(B, 64, 8, vocab,
                                                       seed=5)
    params = model.init({"params": jax.random.PRNGKey(0)}, feats, lens,
                        labels, lab_lens)["params"]
    loss_obj = Loss({"model": "Pruned_Rnnt", "config": {}})
    tx = scaled_adam(learning_rate=3e-3)
    opt_state = tx.init(params)
    tp_rules = ([("joiner/enc_proj/kernel", P(None, "model")),
                 ("joiner/pre_proj/kernel", P(None, "model")),
                 ("predictor/out/kernel", P(None, "model"))]
                if tp else None)
    p_shard = shard_params(mesh, params, fsdp=fsdp, tp_rules=tp_rules)
    params = jax.device_put(params, p_shard)
    o_shard = shard_params(mesh, opt_state, fsdp=fsdp)
    opt_state = jax.device_put(opt_state, o_shard)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def train_step(params, opt_state, feats, lens, labels, lab_lens):
        def lf(p):
            out = model.apply({"params": p}, feats, lens, labels, lab_lens)
            pruned = loss_obj({"logits": out["logits"],
                               "ranges": out["ranges"],
                               "logits_length": out["enc_lens"],
                               "label": labels, "label_length": lab_lens})
            return 0.5 * out["simple_loss"] + 0.5 * pruned

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jstep = jax.jit(train_step,
                    in_shardings=(p_shard, o_shard, bsh, bsh, bsh, bsh),
                    out_shardings=(p_shard, o_shard, rep))
    losses = []
    with mesh:
        feats = jax.device_put(feats, bsh)
        lens = jax.device_put(lens, bsh)
        labels = jax.device_put(labels, bsh)
        lab_lens = jax.device_put(lab_lens, bsh)
        for _ in range(steps):
            params, opt_state, loss = jstep(params, opt_state, feats, lens,
                                            labels, lab_lens)
            losses.append(float(loss))
    final = jax.device_get(
        jax.tree.map(lambda x: np.asarray(x, np.float32), params))
    return np.asarray(losses), final


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fsdp_tp_trajectory_matches_single_device():
    l1, p1 = _run_trajectory(data=1, model_axis=1)
    l8, p8 = _run_trajectory(data=4, model_axis=2, tp=True, fsdp=True)
    assert np.isfinite(l1).all() and np.isfinite(l8).all()
    # training must actually move
    assert l1[-1] < l1[0]
    np.testing.assert_allclose(l8, l1, rtol=5e-3, atol=5e-3)
    # parameters agree leaf-by-leaf at the end of the trajectory
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    worst = 0.0
    for path, leaf in flat1:
        other = flat8[path]
        denom = np.maximum(np.abs(leaf).max(), 1e-3)
        rel = np.abs(leaf - other).max() / denom
        worst = max(worst, rel)
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)
    assert worst > 0.0  # sanity: we actually compared something


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_flagship_dims_fsdp_tp_trajectory_parity():
    """Same FSDP+TP parity check at the FLAGSHIP encoder dims (12 layers,
    192/256 dim-changing stacks, ds 1/2/4/8/4/2): short T, 3 steps —
    catches the padding/sharding bug class that tiny dims can't (uneven
    per-shard T after subsampling, channel-converting stack joins)."""
    l1, p1 = _run_trajectory(data=1, model_axis=1, flagship=True, steps=3)
    l8, p8 = _run_trajectory(data=4, model_axis=2, tp=True, fsdp=True,
                             flagship=True, steps=3)
    assert np.isfinite(l1).all() and np.isfinite(l8).all()
    np.testing.assert_allclose(l8, l1, rtol=5e-3, atol=5e-3)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    for path, leaf in flat1:
        other = flat8[path]
        denom = np.maximum(np.abs(leaf).max(), 1e-3)
        rel = np.abs(leaf - other).max() / denom
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)
