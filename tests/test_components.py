"""Component tests: batcher, augmentation, metrics, schedules, ScaledAdam,
CIF layer, BEST-RQ, checkpoint round-trip + averaging.

Mirrors reference colocated tests: dataset/sampler_test, utils_test,
cif_layer_test, best_rq_test, optimizer behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech2text_tpu.data import augment
from speech2text_tpu.data.batcher import BucketBatcher, build_bucket_specs
from speech2text_tpu.metrics import (AsrMetric, levenshtein,
                                     masked_topk_accuracy, word_error_rate)
from speech2text_tpu.models.best_rq import (BestRQConfig, BestRQLayer,
                                            MaskingStrategyConfig)
from speech2text_tpu.models.cif import CifConfig, CifLayer, integrate_and_fire
from speech2text_tpu.optim import scaled_adam
from speech2text_tpu.optim.schedules import (EdenSchedule,
                                             NoamHoldAnnealingSchedule,
                                             WarmupLRSchedule)


class TestBatcher:

    def test_fixed_shapes_and_volume(self, rng):
        durs = rng.uniform(1.0, 12.0, size=200)
        toks = (durs * 3).astype(int)
        specs = build_bucket_specs(durs, toks, num_buckets=4,
                                   volume_threshold=60.0, min_batch_size=2,
                                   batch_multiple=4)
        assert all(s.batch_size % 4 == 0 for s in specs)
        assert all(s.pcm_len % 16000 == 0 for s in specs)
        # shorter buckets get bigger batches (constant volume)
        sizes = [s.batch_size for s in specs]
        assert sizes == sorted(sizes, reverse=True)

    def test_sharding_and_epoch(self, rng):
        durs = rng.uniform(1.0, 10.0, size=101)
        specs = build_bucket_specs(durs, np.ones(101, int), num_buckets=2,
                                   volume_threshold=30.0, min_batch_size=2)
        b0 = BucketBatcher(durs, specs, seed=5, shard_index=0, num_shards=2)
        b1 = BucketBatcher(durs, specs, seed=5, shard_index=1, num_shards=2)
        e0 = b0.epoch_batches(0)
        e1 = b1.epoch_batches(0)
        idx0 = {i for _, idxs in e0 for i in idxs}
        idx1 = {i for _, idxs in e1 for i in idxs}
        assert idx0.isdisjoint(idx1)
        # multihost lockstep: same batch count, same bucket (shape)
        # sequence, equal local sizes = trimmed global / num_shards
        assert len(e0) == len(e1)
        for (bb0, i0), (bb1, i1) in zip(e0, e1):
            assert bb0 == bb1 and len(i0) == len(i1)
            assert len(i0) == specs[bb0].batch_size // 2 or \
                len(i0) * 2 <= specs[bb0].batch_size
        # reshuffles across epochs
        assert b0.epoch_batches(0) != b0.epoch_batches(1)


class TestAugment:

    def test_spec_augment_zeroes_and_respects_apply(self, rng):
        feats = jnp.ones((2, 100, 40))
        lens = jnp.asarray([100, 60])
        out = augment.spec_augment(feats, lens, jax.random.PRNGKey(0),
                                   apply=jnp.asarray([True, False]))
        out = np.asarray(out)
        assert (out[0] == 0).any()
        np.testing.assert_array_equal(out[1], np.ones((100, 40)))

    def test_add_noise_snr(self, rng):
        pcm = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
        noise = jnp.asarray(rng.standard_normal((2, 4000)) * 0.1,
                            jnp.float32)
        lens = jnp.asarray([8000, 8000])
        nlens = jnp.asarray([4000, 4000])
        out = augment.add_noise(pcm, lens, noise, nlens,
                                jax.random.PRNGKey(1), 10.0, 10.0)
        out = np.asarray(out)
        assert not np.allclose(out, np.asarray(pcm))
        # at 10 dB SNR added noise power ≈ signal/10
        diff = out - np.asarray(pcm)
        ratio = (np.asarray(pcm) ** 2).mean() / (diff ** 2).mean()
        assert 5.0 < ratio < 20.0

    def test_mix_feats_energy(self, rng):
        feats = jnp.asarray(rng.standard_normal((2, 50, 20)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((2, 30, 20)), jnp.float32)
        out = augment.mix_feats(feats, jnp.asarray([50, 50]), noise,
                                jnp.asarray([30, 30]),
                                jax.random.PRNGKey(2))
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert (out >= np.asarray(feats) - 1e-5).all()  # log-add ≥ original


class TestMetrics:

    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein([], [1, 2]) == 2

    def test_wer(self):
        assert word_error_rate(["a b c"], ["a b c"]) == 0.0
        assert word_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
        assert word_error_rate(["ax c"], ["a b c"],
                               use_cer=True) == pytest.approx(2 / 5)

    def test_asr_metric_accumulates(self):
        m = AsrMetric(log_samples=False)
        m.update(["a b"], ["a b"])
        m.update(["a x"], ["a b"])
        assert m.compute() == pytest.approx(0.25)
        assert m.num_utts == 2

    def test_topk_accuracy(self):
        logits = jnp.asarray([[[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]]])
        labels = jnp.asarray([[1, 2]])
        mask = jnp.asarray([[True, True]])
        acc1 = masked_topk_accuracy(logits, labels, mask, k=1)
        acc2 = masked_topk_accuracy(logits, labels, mask, k=2)
        assert float(acc1) == pytest.approx(0.5)
        assert float(acc2) == pytest.approx(0.5)
        # mask excludes the wrong one
        acc_m = masked_topk_accuracy(logits, labels,
                                     jnp.asarray([[True, False]]), k=1)
        assert float(acc_m) == pytest.approx(1.0)


class TestSchedules:

    def test_warmup_peak(self):
        s = WarmupLRSchedule(0.001, warmup_steps=100)
        assert float(s(50)) < float(s(100))
        assert float(s(400)) < float(s(100))

    def test_eden_decays(self):
        s = EdenSchedule(0.045, lr_batches=1000, steps_per_epoch=500)
        assert float(s(10000)) < float(s(1000))

    def test_noam_hold(self):
        s = NoamHoldAnnealingSchedule(0.001, warmup_steps=10, hold_steps=20,
                                      total_steps=100)
        assert float(s(5)) < 0.001
        assert float(s(20)) == pytest.approx(0.001)
        assert float(s(90)) < 0.001


class TestScaledAdam:

    def test_converges_on_quadratic(self):
        target = jnp.asarray([1.0, -2.0, 3.0])
        params = {"w": jnp.zeros(3), "scale": jnp.zeros(())}
        tx = scaled_adam(learning_rate=0.1, clipping_scale=2.0)
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            grads = jax.grad(
                lambda p: jnp.sum((p["w"] - target) ** 2)
                + p["scale"] ** 2)(params)
            updates, state = tx.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(300):
            params, state = step(params, state)
        np.testing.assert_allclose(np.asarray(params["w"]), target,
                                   atol=0.2)

    def test_clipping_state_updates(self):
        params = {"w": jnp.ones(4)}
        tx = scaled_adam(learning_rate=0.01, clipping_scale=2.0,
                         norm_buffer_size=8)
        state = tx.init(params)
        g = {"w": jnp.full(4, 100.0)}
        _, state2 = tx.update(g, state, params)
        assert float(state2.norm_buffer[0]) == pytest.approx(200.0)


class TestCif:

    def test_integrate_and_fire_exact(self):
        # alphas 0.6, 0.6 → fire at t=1 with weights (0.6, 0.4), carry 0.2
        h = jnp.asarray([[[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]]])
        alphas = jnp.asarray([[0.6, 0.6, 0.9]])
        embeds, count, accum, embed = integrate_and_fire(h, alphas, u_cap=4)
        assert int(count[0]) == 2
        np.testing.assert_allclose(np.asarray(embeds[0, 0]), [0.6, 0.4],
                                   atol=1e-6)
        # second fire at t=2: carry 0.2·h1 + 0.8·h2
        np.testing.assert_allclose(np.asarray(embeds[0, 1]),
                                   [0.2 * 0 + 0.8 * 2, 0.2 * 1 + 0.8 * 2],
                                   atol=1e-6)
        assert float(accum[0]) == pytest.approx(0.1, abs=1e-6)

    def test_train_scaling_emits_target_count(self, rng):
        m = CifLayer(CifConfig(input_dim=8, max_tokens=16))
        h = jnp.asarray(rng.standard_normal((2, 40, 8)), jnp.float32)
        lens = jnp.asarray([40, 30])
        tgt = jnp.asarray([5, 3])
        params = m.init(jax.random.PRNGKey(0), h, lens, tgt)
        embeds, pred, count = m.apply(params, h, lens, tgt)
        # rescaled alphas sum to target → emits target-1 or target fires
        assert abs(int(count[0]) - 5) <= 1
        assert abs(int(count[1]) - 3) <= 1

    def test_inference_tail(self, rng):
        m = CifLayer(CifConfig(input_dim=8, max_tokens=16))
        h = jnp.asarray(rng.standard_normal((1, 40, 8)), jnp.float32)
        lens = jnp.asarray([40])
        params = m.init(jax.random.PRNGKey(0), h, lens,
                        jnp.asarray([4]))
        embeds, pred, count = m.apply(params, h, lens, None)
        assert int(count[0]) >= 1


class TestBestRQ:

    def _layer(self):
        return BestRQLayer(BestRQConfig(
            feature_dim=16, stack_size=2, num_codebooks=2,
            codebook_size=32, codebook_dim=8,
            masking=MaskingStrategyConfig(mask_proportion=0.4,
                                          mean_span_length=2)))

    def test_labels_deterministic_and_in_range(self, rng):
        layer = self._layer()
        feats = jnp.asarray(rng.standard_normal((2, 20, 16)), jnp.float32)
        lens = jnp.asarray([20, 14])
        l1, lens2 = layer.labels(feats, lens)
        l2, _ = layer.labels(feats, lens)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert l1.shape == (2, 2, 10)
        assert (np.asarray(l1) >= 0).all() and (np.asarray(l1) < 32).all()
        assert int(lens2[1]) == 7

    def test_mask_rate_and_noise(self, rng):
        layer = self._layer()
        feats = jnp.asarray(rng.standard_normal((4, 40, 16)), jnp.float32)
        lens = jnp.full((4,), 40, jnp.int32)
        masked, labels, mask2, lens2 = layer(jax.random.PRNGKey(3), feats,
                                             feats, lens)
        rate = float(mask2.mean())
        assert 0.1 < rate < 0.8
        changed = np.any(np.asarray(masked) != np.asarray(feats), axis=-1)
        # frames under the mask must have been replaced
        m = np.asarray(mask2).repeat(2, axis=1)
        assert changed[m[:, :40]].all()


class TestCheckpointing:

    def test_topk_and_average(self, tmp_path, rng):
        from speech2text_tpu.train.checkpoint import (CheckpointManager,
                                                      average_checkpoints)
        mgr = CheckpointManager(str(tmp_path), save_top_k=2, monitor="wer",
                                mode="min")
        for step, wer in [(1, 0.9), (2, 0.5), (3, 0.7), (4, 0.8)]:
            state = {"params": {"w": np.full((3,), float(step),
                                             np.float32)},
                     "opt_state": [np.zeros(1)], "step": step}
            mgr.save(step, state, metrics={"wer": wer})
        # top-2 by wer = steps 2, 3; latest (4) always kept
        kept = set(mgr._index["checkpoints"])
        assert kept == {"2", "3", "4"}
        assert mgr.best_steps(1) == [2]
        avg = average_checkpoints(str(tmp_path), best_k=2)
        np.testing.assert_allclose(np.asarray(avg["w"]),
                                   np.full(3, 2.5), atol=1e-6)

    def test_topk_tie_breaks_to_latest(self, tmp_path):
        """Flat monitor (dev WER pinned at 1.0): top-k must keep the MOST
        trained checkpoints, not freeze on the earliest saves (regression:
        emformer heldout run averaged steps 100-300 of a 1500-step run)."""
        from speech2text_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path), save_top_k=2, monitor="wer",
                                mode="min")
        for step in [1, 2, 3, 4]:
            state = {"params": {"w": np.full((2,), float(step),
                                             np.float32)}, "step": step}
            mgr.save(step, state, metrics={"wer": 1.0})
        assert set(mgr._index["checkpoints"]) == {"3", "4"}
        assert mgr.best_steps(2) == [4, 3]

    def test_restore_latest(self, tmp_path):
        from speech2text_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path))
        state = {"params": {"w": np.ones(2, np.float32)}, "step": 7}
        mgr.save(7, state, metrics={"wer": 0.1})
        step, restored = mgr.restore_latest(
            {"params": {"w": jax.ShapeDtypeStruct((2,), np.float32)},
             "step": 0})
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.ones(2))


class TestSeparateLr:
    """Per-module LR groups (reference `seperate_lr`,
    task_factory/rnnt_task.py:150-188)."""

    def _config(self, apply):
        return {
            "seperate_lr": {"apply": apply,
                            "config": {"encoder_lr": 1.0,
                                       "joiner_lr": 0.0}},
            "optimizer": {"type": "Adam", "config": {"lr": 0.1}},
            "lr_scheduler": {"type": "Warmup",
                             "config": {"warmup_steps": 1}},
        }

    def test_groups_get_their_own_lr(self):
        from speech2text_tpu.optim.setup import OptimSetup
        tx, _ = OptimSetup(self._config(True))
        params = {"encoder": {"w": jnp.ones((4,))},
                  "joiner": {"w": jnp.ones((4,))},
                  "predictor": {"w": jnp.ones((4,))}}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # joiner_lr = 0 → frozen; encoder_lr = 1.0 ≫ default 0.1
        assert float(jnp.abs(updates["joiner"]["w"]).sum()) == 0.0
        enc = float(jnp.abs(updates["encoder"]["w"]).sum())
        pred = float(jnp.abs(updates["predictor"]["w"]).sum())
        assert enc > pred > 0.0

    def test_disabled_is_uniform(self):
        from speech2text_tpu.optim.setup import OptimSetup
        tx, _ = OptimSetup(self._config(False))
        params = {"encoder": {"w": jnp.ones((4,))},
                  "joiner": {"w": jnp.ones((4,))}}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(np.asarray(updates["encoder"]["w"]),
                                   np.asarray(updates["joiner"]["w"]))
