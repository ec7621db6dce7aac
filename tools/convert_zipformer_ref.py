"""Convert a reference (torch) Zipformer2 state_dict to this repo's flax
param tree — encoder stacks + output downsample only.

Reference: /root/reference/model/encoder/zipformer.py (Zipformer2). The
subsampling frontend (`_encoder_embed.*`) is architecturally different here
(channel plan 32/32/32 + causal-capable ConvNeXt vs the reference's
8/32/128) and is NOT converted; the parity oracle
(tests/test_zipformer_ref_oracle.py) therefore compares the post-embed
encoder forward, which is where ~95% of the compute and all of the
attention/conv/ff math lives.

Conventions bridged (see each mapping below):
  - torch nn.Linear stores (out, in); flax Dense kernels are (in, out).
  - The reference's fused attention in_proj (2·H·qd + H·pd rows) splits
    into q/k/qpos here.
  - This repo scales content scores by 1/sqrt(query_head_dim) and pos
    scores by 1/sqrt(pos_head_dim) (the conventional softmax-attention
    scaling); the reference applies NO score scaling
    (zipformer.py:1977 `attn_scores = torch.matmul(q, k)`). The factors
    are folded INTO the converted q/qpos projections so the scores match.
  - torch depthwise Conv1d weight (C, 1, K) → flax Conv kernel (K, 1, C).
  - SimpleDownsample's learned softmax logits: `bias` → `weights`.

Usage (also importable):
  python tools/convert_zipformer_ref.py ref_state.pt out_params.msgpack
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["convert_ref_zipformer", "convert_ref_stateless_predictor",
           "convert_ref_joiner"]


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _convert_layer(sd, pref: str, num_heads: int, query_head_dim: int,
                   pos_head_dim: int) -> dict:
    H, qd, pd = num_heads, query_head_dim, pos_head_dim
    qdim = H * qd

    in_w = np.asarray(sd[f"{pref}.self_attn_weights.in_proj.weight"])
    in_b = np.asarray(sd[f"{pref}.self_attn_weights.in_proj.bias"])
    sq = math.sqrt(qd)
    sp = math.sqrt(pd)
    attn = {
        # fold the 1/sqrt(d) score scaling into q / qpos (reference
        # applies none — zipformer.py:1977)
        "q_proj": {"kernel": _t(in_w[:qdim]) * sq, "bias": in_b[:qdim] * sq},
        "k_proj": {"kernel": _t(in_w[qdim:2 * qdim]),
                   "bias": in_b[qdim:2 * qdim]},
        "qpos_proj": {"kernel": _t(in_w[2 * qdim:]) * sp,
                      "bias": in_b[2 * qdim:] * sp},
        "pos_proj": {"kernel": _t(
            sd[f"{pref}.self_attn_weights.linear_pos.weight"])},
    }

    def dense(name):
        return {"kernel": _t(sd[f"{name}.weight"]),
                "bias": np.asarray(sd[f"{name}.bias"])}

    def ff(name):
        return {"in": dense(f"{name}.in_proj"),
                "out": dense(f"{name}.out_proj")}

    def conv(name):
        dw = np.asarray(sd[f"{name}.depthwise_conv.weight"])  # (C, 1, K)
        return {
            "in_proj": dense(f"{name}.in_proj"),
            "dw": {"kernel": np.ascontiguousarray(dw.transpose(2, 1, 0)),
                   "bias": np.asarray(sd[f"{name}.depthwise_conv.bias"])},
            "out_proj": dense(f"{name}.out_proj"),
        }

    def sa(name):
        return {"v_proj": dense(f"{name}.in_proj"),
                "out_proj": dense(f"{name}.out_proj")}

    return {
        "attn_weights": attn,
        "ff1": ff(f"{pref}.feed_forward1"),
        "ff2": ff(f"{pref}.feed_forward2"),
        "ff3": ff(f"{pref}.feed_forward3"),
        "nonlin_attn": {"in_proj": dense(f"{pref}.nonlin_attention.in_proj"),
                        "out_proj":
                            dense(f"{pref}.nonlin_attention.out_proj")},
        "self_attn1": sa(f"{pref}.self_attn1"),
        "self_attn2": sa(f"{pref}.self_attn2"),
        "conv1": conv(f"{pref}.conv_module1"),
        "conv2": conv(f"{pref}.conv_module2"),
        "norm": {"bias": np.asarray(sd[f"{pref}.norm.bias"]),
                 "log_scale": np.asarray(sd[f"{pref}.norm.log_scale"])},
        "bypass": {"bypass_scale":
                   np.asarray(sd[f"{pref}.bypass.bypass_scale"])},
        "bypass_mid": {"bypass_scale":
                       np.asarray(sd[f"{pref}.bypass_mid.bypass_scale"])},
    }


def convert_ref_zipformer(sd, cfg) -> dict:
    """state_dict (tensor- or ndarray-valued) + dim config dict →
    flax params for `stack{i}` and `out_downsample` (no `embed`).

    cfg needs: num_encoder_layers, downsampling_factor, num_heads,
    query_head_dim, pos_head_dim.
    """
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in sd.items()}
    params: dict = {}
    for i, n_layers in enumerate(cfg["num_encoder_layers"]):
        ds = cfg["downsampling_factor"][i]
        # reference wraps downsampled stacks: encoders.N.encoder.layers.M
        pref = (f"encoders.{i}.encoder" if ds > 1 else f"encoders.{i}")
        stack: dict = {}
        for m in range(n_layers):
            stack[f"layer{m}"] = _convert_layer(
                sd, f"{pref}.layers.{m}", cfg["num_heads"][i],
                cfg["query_head_dim"], cfg["pos_head_dim"])
        if ds > 1:
            stack["downsample"] = {
                "weights": np.asarray(sd[f"encoders.{i}.downsample.bias"])}
            stack["stack_bypass"] = {"bypass_scale": np.asarray(
                sd[f"encoders.{i}.out_combiner.bypass_scale"])}
        else:
            # non-downsampled stacks have no out_combiner in the
            # reference; this repo's stack_bypass must act as identity —
            # scale 1.0 means out = x_new exactly (BypassModule math).
            d = int(sd[f"{pref}.layers.0.norm.bias"].shape[0])
            stack["stack_bypass"] = {"bypass_scale": np.ones(d, np.float32)}
        params[f"stack{i}"] = stack
    params["out_downsample"] = {
        "weights": np.asarray(sd["downsample_output.bias"])}
    return params


def _np(v) -> np.ndarray:
    return np.asarray(getattr(v, "numpy", lambda: v)())


def convert_ref_stateless_predictor(sd) -> dict:
    """Reference StatelessPredictor state_dict → flax params
    (stateless_predictor.py:37-56: Embedding → depthwise Conv1d
    (groups=emb_dim, no bias) → Linear)."""
    conv = _np(sd["_conv.weight"])  # (D, 1, K)
    return {
        "embed": {"embedding": _np(sd["_embedding.weight"])},
        "conv": {"kernel": np.ascontiguousarray(conv.transpose(2, 1, 0))},
        "out": {"kernel": _t(sd["_output_linear.weight"]),
                "bias": _np(sd["_output_linear.bias"])},
    }


def convert_ref_joiner(sd) -> dict:
    """Reference Joiner state_dict → flax params (joiner.py:40-57:
    enc/pre projections + optional 2-layer out projection)."""
    params = {
        "enc_proj": {"kernel": _t(sd["_enc_proj.weight"]),
                     "bias": _np(sd["_enc_proj.bias"])},
        "pre_proj": {"kernel": _t(sd["_pre_proj.weight"]),
                     "bias": _np(sd["_pre_proj.bias"])},
    }
    if "_out_projection.0.weight" in sd:
        params["out_proj_a"] = {"kernel": _t(sd["_out_projection.0.weight"]),
                                "bias": _np(sd["_out_projection.0.bias"])}
        params["out_proj_b"] = {"kernel": _t(sd["_out_projection.1.weight"]),
                                "bias": _np(sd["_out_projection.1.bias"])}
    return params
