"""Round-3 fixes: mid-epoch data resume (reference trainer.fit(ckpt_path=…)
restores full loop state, build_task.py:147-148), ScaledAdam non-finite
grad handling (reference _get_clipping_scale ans=0.0 + grad zeroing,
scaled_adam.py:481-499), wav2vec2 layout-mismatch guard, Emformer
streaming chunk-size guard, LmPipeline seed plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.data.batcher import BucketBatcher, build_bucket_specs
from speech2text_tpu.data.dataset import AsrPipeline, DataConfig, LmPipeline
from speech2text_tpu.data.tokenizer import CharTokenizer
from speech2text_tpu.optim.scaled_adam import scaled_adam

FIXTURE = "/root/reference/sample_data"
needs_fixture = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                                   reason="reference fixture unavailable")


# --------------------------------------------------------------- iter_from
def test_batcher_iter_from_matches_skip():
    rng = np.random.default_rng(0)
    durs = rng.uniform(1.0, 8.0, size=57)
    toks = rng.integers(5, 40, size=57)
    specs = build_bucket_specs(durs, toks, num_buckets=3,
                               volume_threshold=30.0, min_batch_size=2)
    b = BucketBatcher(durs, specs, seed=11)
    ref = [next(iter_) for iter_ in [iter(b)] for _ in range(0)]  # noqa
    it_full = iter(b)
    full = [next(it_full) for _ in range(40)]
    for start in (0, 3, b.batches_per_epoch(), b.batches_per_epoch() + 5):
        it = b.iter_from(start)
        got = [next(it) for _ in range(10)]
        assert got == full[start:start + 10], f"mismatch from {start}"


@needs_fixture
def test_asr_pipeline_resume_exact():
    """skip_batches(k) replays exactly the batches (indices AND
    augmentation randomness) an uninterrupted run would produce."""
    cfg = DataConfig(
        train_data=f"{FIXTURE}/asr_train_data.json",
        noise_data=f"{FIXTURE}/noise_data.json",
        base_dir="/root/reference",
        dur_min_filter=0.1, dur_max_filter=8.0,
        batch_size=4, num_buckets=2,
        bucket_sampler_config={"num_bucket": 2, "min_batch_size": 4,
                               "volume_threshold": 20.0},
        data_aug_config={"use_speed_perturb": True, "use_add_noise": True},
    )
    tok = CharTokenizer()
    it = iter(AsrPipeline(cfg.train_data, tok, cfg, training=True, seed=3))
    uninterrupted = [next(it) for _ in range(6)]
    resumed = AsrPipeline(cfg.train_data, tok, cfg, training=True, seed=3)
    resumed.skip_batches(3)
    it2 = iter(resumed)
    for k in range(3, 6):
        got = next(it2)
        want = uninterrupted[k]
        for key in ("pcm", "pcm_length", "label", "label_length",
                    "noise_pcm", "noise_length"):
            np.testing.assert_array_equal(got[key], want[key],
                                          err_msg=f"batch {k} key {key}")


def test_lm_pipeline_seed_and_resume(tmp_path):
    import json
    man = tmp_path / "lm.json"
    with open(man, "w") as f:
        for i in range(23):
            f.write(json.dumps({"text": f"word{i} " * (3 + i % 5)}) + "\n")
    tok = CharTokenizer()
    mk = lambda seed: LmPipeline(str(man), tok, batch_size=4, seed=seed)
    a = [b["text"].copy() for _, b in zip(range(8), mk(1))]
    b_ = [b["text"].copy() for _, b in zip(range(8), mk(1))]
    c = [b["text"].copy() for _, b in zip(range(8), mk(2))]
    for x, y in zip(a, b_):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c)), \
        "different seeds must give different order"
    r = mk(1)
    r.skip_batches(5)
    resumed = [b["text"].copy() for _, b in zip(range(3), r)]
    for k in range(3):
        np.testing.assert_array_equal(resumed[k], a[5 + k])


# ------------------------------------------------- ScaledAdam non-finite
def test_scaled_adam_survives_nonfinite_grads():
    params = {"w": jnp.ones((4, 4)) * 0.5, "b": jnp.zeros((4,)),
              "s": jnp.asarray(1.0)}
    tx = scaled_adam(learning_rate=0.1)
    state = tx.init(params)
    good = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)
    upd = jax.jit(tx.update)
    # warm up past the no-clip window so the clipping path is active
    for _ in range(12):
        updates, state = upd(good, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    ref_params = params
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    bad["w"] = jnp.full_like(params["w"], jnp.inf)
    updates, state = upd(bad, state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    # the bad step must not introduce non-finite params or state
    for leaf in jax.tree.leaves(params):
        assert jnp.isfinite(leaf).all(), "params poisoned by NaN grads"
    assert jnp.isfinite(state.norm_buffer).all(), \
        "NaN leaked into the clipping ring buffer"
    # and training must recover: further good steps stay finite and move
    for _ in range(5):
        updates, state = upd(good, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    for leaf in jax.tree.leaves(params):
        assert jnp.isfinite(leaf).all()
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0,
                         params, ref_params)
    assert all(jax.tree.leaves(moved)), "optimizer wedged after bad batch"


# ------------------------------------------------------ layout validation
def test_wav2vec2_layout_mismatch_raises(tmp_path):
    from flax import serialization

    from speech2text_tpu.tasks import base as task_base

    tree = {"__layout__": {"num_layers": np.asarray(2, np.int32),
                           "do_stable_layer_norm": np.asarray(1, np.int32),
                           "feat_extract_norm": np.asarray(1, np.int32)}}
    path = tmp_path / "w2v2.msgpack"
    path.write_bytes(serialization.msgpack_serialize(tree))

    # minimal shim with the real implementation bound (avoids building a
    # full task just to exercise the validation)
    class Shim:
        config = {"encoder": {"config": {
            "pretrained_path": str(path),
            "num_layers": 2,
            "do_stable_layer_norm": False,   # checkpoint says True
            "feat_extract_norm": "layer",
        }}}
        merge_pretrained_encoder = \
            task_base.AsrTaskBase.merge_pretrained_encoder

    with pytest.raises(ValueError, match="do_stable_layer_norm"):
        Shim().merge_pretrained_encoder({"encoder": {}})


# ------------------------------------------------- emformer chunk guard
def test_emformer_streaming_step_wrong_chunk_raises():
    from speech2text_tpu.models.emformer import Emformer, EmformerConfig
    cfg = EmformerConfig(feats_dim=80, subsampling_rate=4, input_dim=32,
                         num_heads=2, ffn_dim=64, num_layers=1,
                         segment_length=4, left_context_length=4,
                         right_context_length=0, max_memory_size=2,
                         output_dim=32, dropout=0.0)
    m = Emformer(cfg)
    x = jnp.zeros((1, 131, 80))
    lens = jnp.asarray([131])
    params = m.init({"params": jax.random.PRNGKey(0)}, x, lens)["params"]
    states = m.init_state(1)
    # chunk spanning TWO segments post-subsample → must raise
    with pytest.raises(ValueError, match="segment_length"):
        m.apply({"params": params}, x[:, :32], states,
                method=Emformer.streaming_step)
