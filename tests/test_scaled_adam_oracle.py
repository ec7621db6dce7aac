"""ScaledAdam vs the reference torch implementation as a numeric oracle.

Drives /root/reference/optimizer/scaled_adam.py (torch CPU) and the optax
rebuild with identical parameters and a deterministic grad function, and
asserts the parameter trajectories match step for step — across
size-update period boundaries (steps 3, 7, 11) and both the tensor and
scalar code paths. Clipping is compared separately (directional), since
the reference recomputes its threshold on a host-side schedule while the
rebuild keeps a jit-friendly rolling median."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech2text_tpu.optim.scaled_adam import (dominant_parameter_report,

                                               scaled_adam)

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")


def _load_reference_scaled_adam():
    spec = importlib.util.spec_from_file_location(
        "ref_scaled_adam", "/root/reference/optimizer/scaled_adam.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_scaled_adam"] = mod
    spec.loader.exec_module(mod)
    return mod


LR = 0.04
STEPS = 13


def _grad_fn(ps):
    """Deterministic grad as a function of current params (numpy dicts)."""
    return {
        "w": 0.3 * ps["w"] + 0.05 * np.sin(ps["w"] * 3.0) + 0.02,
        "u": -0.2 * ps["u"] + 0.01,
        "s": 0.5 * ps["s"] - 0.03,
    }


def _init_params(rng):
    return {
        "w": rng.standard_normal((5, 3)).astype(np.float32) * 0.3,
        "u": rng.standard_normal((2, 2, 4)).astype(np.float32) * 0.1,
        "s": np.asarray([0.7], np.float32),  # scalar path
    }


def test_matches_reference_without_clipping():
    ref = _load_reference_scaled_adam()
    rng = np.random.default_rng(0)
    init = _init_params(rng)

    # ---- torch reference
    tps = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
           for k, v in init.items()}
    opt = ref.ScaledAdam([tps[k] for k in ("w", "u", "s")], lr=LR,
                         clipping_scale=None)
    torch_traj = []
    for _ in range(STEPS):
        cur = {k: v.detach().numpy().copy() for k, v in tps.items()}
        g = _grad_fn(cur)
        for k in tps:
            tps[k].grad = torch.from_numpy(g[k].copy())
        opt.step()
        torch_traj.append({k: v.detach().numpy().copy()
                           for k, v in tps.items()})

    # ---- optax rebuild
    params = {k: jnp.asarray(v) for k, v in init.items()}
    tx = scaled_adam(learning_rate=LR, clipping_scale=None)
    state = tx.init(params)
    for i in range(STEPS):
        cur = {k: np.asarray(v) for k, v in params.items()}
        g = {k: jnp.asarray(v) for k, v in _grad_fn(cur).items()}
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(params[k]), torch_traj[i][k], atol=2e-6,
                rtol=1e-5, err_msg=f"step {i} param {k}")


def test_clipping_bounds_update_magnitude():
    """With clipping on, a sudden 100x grad spike after warmup must be
    attenuated relative to the unclipped optimizer."""
    rng = np.random.default_rng(1)
    w0 = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32) * 0.3)

    def run(clipping):
        params = {"w": w0}
        tx = scaled_adam(learning_rate=0.05, clipping_scale=clipping,
                         norm_buffer_size=100)
        state = tx.init(params)
        base_g = jnp.asarray(
            rng.standard_normal((8, 8)).astype(np.float32) * 0.01)
        for i in range(120):
            g = base_g * (100.0 if i == 115 else 1.0)
            upd, state = tx.update({"w": g}, state, params)
            if i == 115:
                spike_norm = float(jnp.linalg.norm(upd["w"]))
            params = optax.apply_updates(params, upd)
        return spike_norm

    assert run(2.0) < 0.5 * run(None)


def test_scalar_clamp():
    params = {"s": jnp.asarray([25.0], jnp.float32)}  # beyond scalar_max
    tx = scaled_adam(learning_rate=0.1, clipping_scale=None,
                     scalar_max=10.0)
    state = tx.init(params)
    upd, state = tx.update({"s": jnp.asarray([0.01], jnp.float32)},
                           state, params)
    new = optax.apply_updates(params, upd)
    assert float(new["s"][0]) <= 10.0 + 1e-4


def test_dominant_parameter_report():
    params = {"big": jnp.ones((16, 16)), "small": jnp.ones((2, 2)) * 0.01}
    grads = {"big": jnp.ones((16, 16)), "small": jnp.ones((2, 2))}
    rows = dominant_parameter_report(grads, params, top_k=2)
    assert rows[0][0] == "big" and rows[0][1] > 0.9
