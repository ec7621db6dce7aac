"""TensorBoard event writer: files must parse with the real TF/TB reader
(independent oracle) and round-trip tags/steps/values exactly."""

import glob
import os

import numpy as np
import pytest

from speech2text_tpu.train.tb_writer import TensorBoardWriter, _crc32c


def test_crc32c_known_vectors():
    # published CRC-32C test vectors (RFC 3720 appendix B.4 style)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_events_parse_with_tensorboard_reader(tmp_path):
    logdir = str(tmp_path / "tb")
    w = TensorBoardWriter(logdir)
    points = [("train/loss", 3.5, 10), ("train/loss", 2.25, 20),
              ("eval/wer", 0.19, 20)]
    for tag, val, step in points:
        w.add_scalar(tag, val, step)
    w.close()
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1

    # independent reader: TensorBoard's own event file loader
    loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    got = []
    version = None
    for ev in loader.EventFileLoader(files[0]).Load():
        if ev.file_version:
            version = ev.file_version
        for v in ev.summary.value:
            # newer TB loaders migrate simple_value → scalar tensor
            if v.WhichOneof("value") == "tensor":
                val = v.tensor.float_val[0]
            else:
                val = v.simple_value
            got.append((v.tag, val, ev.step))
    assert version == "brain.Event:2"
    assert len(got) == len(points)
    for (tag, val, step), (gt, gv, gs) in zip(points, got):
        assert tag == gt and step == gs
        np.testing.assert_allclose(gv, val, rtol=1e-6)


def test_train_loop_writes_events(tmp_path):
    """The driver-visible behavior: an events file appears in workdir/tb
    during training (reference build_task.py:62-64)."""
    logdir = str(tmp_path / "tb")
    w = TensorBoardWriter(logdir)
    w.add_scalar("train/train_loss", 1.0, 1)
    w.flush()
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert files and os.path.getsize(files[0]) > 0
