"""ASR data-pipeline integration tests on the real LibriSpeech fixture
(mirrors reference dataset/dataset_test.py, which iterates real DataLoaders
over sample_data at several batch sizes)."""

import os

import numpy as np
import pytest

from speech2text_tpu.data.dataset import AsrPipeline, DataConfig, NoisePool
from speech2text_tpu.data.tokenizer import CharTokenizer

FIXTURE = "/root/reference/sample_data"
pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                                reason="reference fixture unavailable")


def make_config(**kw):
    base = dict(
        train_data=f"{FIXTURE}/asr_train_data.json",
        eval_data=f"{FIXTURE}/asr_eval_data.json",
        noise_data=f"{FIXTURE}/noise_data.json",
        base_dir="/root/reference",
        dur_min_filter=0.1, dur_max_filter=8.0,
        batch_size=4, num_buckets=2,
        bucket_sampler_config={"num_bucket": 2, "min_batch_size": 4,
                               "volume_threshold": 20.0},
        data_aug_config={"use_speed_perturb": True, "use_add_noise": True,
                         "use_spec_aug": True},
    )
    base.update(kw)
    return DataConfig(**base)


class TestAsrPipeline:

    def test_train_batches_fixed_shapes(self):
        cfg = make_config()
        pipe = AsrPipeline(cfg.train_data, CharTokenizer(), cfg,
                           training=True, seed=3)
        shapes = {}
        it = iter(pipe)
        for _ in range(6):
            b = next(it)
            key = b["pcm"].shape
            shapes.setdefault(key, 0)
            shapes[key] += 1
            # contract checks
            # wire format: int16 by default (halved host->device bytes)
            assert b["pcm"].dtype == np.int16
            assert (b["pcm_length"] <= b["pcm"].shape[1]).all()
            assert (b["label_length"] <= b["label"].shape[1]).all()
            assert (b["label"][0, :b["label_length"][0]] > 0).all()
            assert "noise_pcm" in b and "noise_length" in b
        # ≤ num_bucket distinct shapes (XLA program count bound)
        assert len(shapes) <= 2

    def test_eval_single_epoch_covers_all(self):
        cfg = make_config(data_aug_config={})
        pipe = AsrPipeline(cfg.eval_data, CharTokenizer(), cfg,
                           training=False)
        total = sum(b["pcm"].shape[0] for b in pipe)
        # topped-up partial batches may repeat entries, never drop below
        assert total >= len(pipe.entries)

    def test_test_pipeline_keeps_text(self):
        cfg = make_config(test_data=f"{FIXTURE}/asr_eval_data.json",
                          data_aug_config={})
        pipe = AsrPipeline(cfg.test_data, CharTokenizer(), cfg,
                           training=False, keep_text=True)
        b = next(iter(pipe))
        assert len(b["text"]) == b["pcm"].shape[0]
        assert all(isinstance(t, str) for t in b["text"])
        assert all(p.endswith(".wav") for p in b["audio_filepath"])

    def test_sharded_pipelines_disjoint(self):
        cfg = make_config(data_aug_config={})
        p0 = AsrPipeline(cfg.train_data, CharTokenizer(), cfg,
                         training=True, seed=5, shard_index=0, num_shards=2)
        p1 = AsrPipeline(cfg.train_data, CharTokenizer(), cfg,
                         training=True, seed=5, shard_index=1, num_shards=2)
        e0 = {i for _, idxs in p0.batcher.epoch_batches(0) for i in idxs}
        e1 = {i for _, idxs in p1.batcher.epoch_batches(0) for i in idxs}
        assert e0.isdisjoint(e1)


def test_noise_pool_sampling(rng):
    pool = NoisePool(f"{FIXTURE}/noise_data.json", "/root/reference",
                     max_seconds=4.0)
    pcm, lens = pool.sample_batch(rng, 3)
    assert pcm.shape[0] == 3
    assert (lens > 0).all()
    assert np.abs(pcm).max() <= 1.0


def test_pcm_int16_wire_equivalence():
    """int16 wire batches dequantize on device to the float32 batches
    (exact round-trip for untouched 16-bit sources; the eval path applies
    no float-domain processing)."""
    import jax.numpy as jnp

    from speech2text_tpu.tasks.base import _dequant_pcm
    cfg16 = make_config(data_aug_config={})
    cfg32 = make_config(data_aug_config={}, pcm_dtype="float32")
    tok = CharTokenizer()
    b16 = next(iter(AsrPipeline(cfg16.eval_data, tok, cfg16,
                                training=False)))
    b32 = next(iter(AsrPipeline(cfg32.eval_data, tok, cfg32,
                                training=False)))
    assert b16["pcm"].dtype == np.int16
    assert b32["pcm"].dtype == np.float32
    deq = np.asarray(_dequant_pcm(jnp.asarray(b16["pcm"])))
    np.testing.assert_allclose(deq, b32["pcm"], atol=1.6e-5)
    # float32 passthrough is the identity
    same = np.asarray(_dequant_pcm(jnp.asarray(b32["pcm"])))
    np.testing.assert_array_equal(same, b32["pcm"])
