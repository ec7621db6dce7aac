"""ONNX deployment export (torch-ecosystem parity surface).

The reference exports streaming zipformer encoder + stateless predictor +
joiner ONNX graphs (plus int8 dynamically-quantized variants) for
sherpa-onnx / mnn-speech2text deployment (reference
task_factory/rnnt_task.py:753-809). This package provides the same
artifacts for the tpu rebuild without any `onnx`/`torch` dependency:

- proto.py    — hand-rolled ONNX protobuf writer/reader
- convert.py  — generic jaxpr → ONNX lowering (opset 17)
- run.py      — numpy evaluator used by tests and as a host-side runner
- quantize.py — dynamic-int8 MatMul/Gather quantization pass

Use `speech2text_tpu.export.export_onnx_modules` for the task-level
encoder/predictor/joiner trio.
"""

from .convert import convert
from .quantize import quantize_dynamic
from .run import OnnxRunner

__all__ = ["convert", "quantize_dynamic", "OnnxRunner"]
