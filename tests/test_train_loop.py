"""Trainer.fit integration on the real fixture (CPU): a short CTC run
plus the host-RSS watchdog (checkpoint + clean exit instead of an OOM
SIGKILL — reference has no failure detection, SURVEY §5)."""

import os

import numpy as np
import pytest

FIXTURE = "/root/reference/sample_data"
pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                                reason="reference fixture unavailable")

TINY_ENCODER = {"model": "Conformer", "config": {
    "feats_dim": 80, "subsampling_rate": 4, "input_dim": 32,
    "num_heads": 2, "ffn_dim": 64, "num_layers": 1,
    "depthwise_conv_kernel_size": 31, "output_dim": 32}}


def _config(workdir, **trainer_kw):
    trainer = {"max_steps": 2, "log_interval": 1,
               "val_check_interval": 1000}
    trainer.update(trainer_kw)
    return {
        "task": {"type": "CTC", "export_path": os.path.dirname(workdir),
                 "name": os.path.basename(workdir)},
        "tokenizer": {"type": "char", "config": {}},
        "dataset": {
            "train_data": f"{FIXTURE}/asr_train_data.json",
            "eval_data": f"{FIXTURE}/asr_eval_data.json",
            "base_dir": "/root/reference",
            "dur_min_filter": 0.1, "dur_max_filter": 4.0,
            "batch_size": 2, "num_buckets": 1,
            "bucket_sampler_config": {"num_bucket": 1,
                                      "min_batch_size": 2,
                                      "volume_threshold": 8.0},
            "feat_type": "lhotes_fbank",
            "feat_config": {"num_mel_bins": 80},
            "data_aug_config": {},
        },
        "encoder": TINY_ENCODER,
        "decoder": {"model": "Projector",
                    "config": {"input_dim": 32, "num_classes": 31,
                               "dropout_p": 0.0}},
        "loss": {"model": "CTC", "config": {}},
        "metric": {},
        "optim_setup": {"optimizer": {"type": "Adam",
                                      "config": {"lr": 1e-3}},
                        "lr_scheduler": {"type": "Warmup",
                                         "config": {"warmup_steps": 10}}},
        "callbacks": {"model_chkpt_config": {"save_top_k": 2,
                                             "monitor": "wer",
                                             "mode": "min"}},
        "trainer": trainer,
    }


def test_fit_smoke_and_rss_guard(tmp_path):
    from speech2text_tpu.tasks import TaskFactory
    from speech2text_tpu.train.loop import Trainer, _rss_gb

    assert _rss_gb() > 0.01  # sanity: watchdog reads a real RSS

    workdir = str(tmp_path / "guarded")
    # threshold far below the live RSS → trips at the first check;
    # rss_restart off → checkpoint + clean return instead of execv
    cfg = _config(workdir, max_rss_gb=0.001, rss_restart=False)
    task = TaskFactory("CTC")(cfg)
    trainer = Trainer(task, cfg, workdir, seed=0)
    trainer.fit()
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts), ckpts
    # the guard fired before max_steps completed
    assert any("step_00000001" in c for c in ckpts), ckpts

def test_rss_gb_tracks_current_not_peak():
    """The watchdog must see CURRENT RSS: a transient allocation (like a
    compile-phase spike) must not trip it forever after. Regression for
    the ru_maxrss high-water-mark bug caught by the round-4 sustained
    run (33 GB trace-time peak, <2 GB steady state → restart loop)."""
    from speech2text_tpu.train.loop import _rss_gb

    before = _rss_gb()
    big = np.ones((150_000_000,), np.float64)  # ~1.2 GB
    big[::4096] = 2.0  # touch every page
    spiked = _rss_gb()
    assert spiked > before + 1.0, (before, spiked)
    del big
    settled = _rss_gb()
    assert settled < spiked - 0.8, (spiked, settled)


def test_trainer_mesh_fsdp_from_yaml(tmp_path):
    """trainer.mesh / trainer.fsdp YAML keys configure the device mesh
    (the reference's `Trainer(gpus=…, strategy=…)` analogue)."""
    from speech2text_tpu.tasks import TaskFactory
    from speech2text_tpu.train.loop import Trainer

    workdir = str(tmp_path / "meshcfg")
    cfg = _config(workdir, mesh={"data": 4, "model": 2}, fsdp=True)
    task = TaskFactory("CTC")(cfg)
    trainer = Trainer(task, cfg, workdir, seed=0)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    assert trainer.fsdp is True
    # explicit constructor args still win over YAML
    from speech2text_tpu.parallel.mesh import MeshConfig, make_mesh
    m = make_mesh(MeshConfig(data=8, model=1))
    trainer2 = Trainer(task, cfg, workdir, seed=0, mesh=m, fsdp=False)
    assert dict(trainer2.mesh.shape) == {"data": 8, "model": 1}
    assert trainer2.fsdp is False
