"""Load the reference torch Zipformer2 as a numeric oracle.

The reference imports glog/onnx/k2 at module scope
(/root/reference/model/encoder/zipformer.py:11-14,
/root/reference/model/layer/scaling.py:11); none are installed here and
none are needed for eval-mode forward math, so they are stubbed:
k2's swoosh kernels are replaced with the published formulas
(SwooshL(x) = log(1+e^(x−4)) − 0.08x − 0.035, SwooshR likewise at x−1 /
0.313261687 — scaling.py:1398-1416,1470-1490), which is exactly what the
reference itself computes when torch.jit tracing.
"""

import sys
import types

import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _stub_modules():
    def _noop(*a, **k):
        return None

    if "glog" not in sys.modules:
        sys.modules["glog"] = types.SimpleNamespace(
            info=_noop, warning=_noop, error=_noop, check=_noop,
            check_eq=_noop, check_le=_noop, check_ge=_noop)
    if "onnx" not in sys.modules:
        sys.modules["onnx"] = types.ModuleType("onnx")
    if "k2" not in sys.modules:
        def swoosh_l(x):
            zero = torch.tensor(0.0, dtype=x.dtype, device=x.device)
            return (torch.logaddexp(zero, x - 4.0) - 0.08 * x - 0.035)

        def swoosh_r(x):
            zero = torch.tensor(0.0, dtype=x.dtype, device=x.device)
            return (torch.logaddexp(zero, x - 1.0) - 0.08 * x
                    - 0.313261687)

        sys.modules["k2"] = types.SimpleNamespace(
            swoosh_l=swoosh_l, swoosh_l_forward=swoosh_l,
            swoosh_r=swoosh_r, swoosh_r_forward=swoosh_r)


def load_ref_zipformer():
    """Returns the reference's zipformer module (imported once)."""
    _stub_modules()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import model.encoder.zipformer as ref_zipformer
    return ref_zipformer


def randomize_(model: "torch.nn.Module", seed: int = 0) -> None:
    """Give every parameter a non-degenerate value so the parity oracle is
    sharp (default init leaves residual out_projs at ~0.05 scale and
    biases/norm params at exactly zero — bugs could hide there).
    Bypass scales are kept inside [0.3, 0.9]: this repo's eval-mode
    BypassModule clamps to [0.25, 1.0] while the reference's eval mode
    does not clamp at all, so values inside the clamp window are the
    regime where both agree (trained reference scales land there too —
    training clamps to [scale_min, 1.0], zipformer.py:1516-1545)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "bypass_scale" in name:
                p.uniform_(0.3, 0.9, generator=g)
            elif "log_scale" in name:
                p.uniform_(-0.2, 0.2, generator=g)
            elif p.ndim >= 2:
                fan_in = p.numel() // p.shape[0]
                p.normal_(0.0, fan_in ** -0.5, generator=g)
            else:
                p.normal_(0.0, 0.3, generator=g)
