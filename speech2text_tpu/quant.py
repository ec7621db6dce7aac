"""Int8 QUANTIZED EXECUTION for transducer decode (predictor + joiner).

The reference exports ONNX with onnxruntime dynamic int8 quantization that
actually runs quantized (reference task_factory/rnnt_task.py:753-809):
MatMul weights are int8 per-channel, activations are quantized at runtime.
`export.save_quantized` already ships the int8 weights artifact; this
module adds the matching COMPUTE path — the same dynamic-quantization
scheme executed on the TPU MXU, which multiplies int8×int8→int32 natively
(at 2× the bf16 rate on v5e):

  a_scale = max|x| / 127     (per row, at runtime — "dynamic")
  y       = (x_q · W_q) · (a_scale · w_scale) + bias

`Int8RnntGreedyDecoding` plugs int8 predictor/joiner step functions into
the batched greedy scan (decoding.py:RnntGreedyDecoding), so decode runs
quantized end-to-end after the encoder. Embedding tables are gathered in
int8 and dequantized per-row; the tiny depthwise context conv stays fp32
(same MatMul-only policy as onnxruntime's quantize_dynamic).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoding import RnntBeamDecoding, RnntGreedyDecoding
from .export import quantize_params


class QTensor:
    """int8 payload + per-output-channel scale (or fp32 passthrough)."""

    def __init__(self, q, scale=None):
        self.q = jnp.asarray(q)
        self.scale = None if scale is None else jnp.asarray(scale)

    @property
    def is_quantized(self) -> bool:
        return self.scale is not None

    def dequant(self) -> jnp.ndarray:
        if self.scale is None:
            return self.q
        return self.q.astype(jnp.float32) * self.scale


def flat_qtree(params, min_size: int = 1024) -> Dict[str, QTensor]:
    """Quantize a param tree with export.quantize_params' exact scheme and
    wrap as {path: QTensor} (also accepts a dict already in the flat
    artifact format produced by save_quantized/np.load)."""
    if isinstance(params, dict) and any(
            k.endswith(".fp32") or k.endswith(".scale")
            for k in params.keys()):
        flat = params
    else:
        flat = quantize_params(params, min_size=min_size)
    out: Dict[str, QTensor] = {}
    for k, v in flat.items():
        if k.endswith(".scale"):
            continue
        if k.endswith(".fp32"):
            out[k[:-5]] = QTensor(np.asarray(v))
        else:
            out[k] = QTensor(np.asarray(v), np.asarray(flat[k + ".scale"]))
    return out


def quant_dense(x: jnp.ndarray, w: QTensor, bias) -> jnp.ndarray:
    """Dynamic-activation int8 dense: x (…, in) · W (in, out) + b."""
    if not w.is_quantized:
        y = jnp.dot(x, w.q, preferred_element_type=jnp.float32)
        return y if bias is None else y + bias
    a_scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    a_scale = jnp.maximum(a_scale, 1e-12)
    xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w.q, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (a_scale * w.scale)
    return y if bias is None else y + bias


class Int8StatelessPredictor:
    """Int8 step function for models/predictor.py:StatelessPredictor."""

    def __init__(self, qt: Dict[str, QTensor], context_size: int,
                 prefix: str = "predictor"):
        self.embed = qt[f"{prefix}/embed/embedding"]
        self.out_w = qt[f"{prefix}/out/kernel"]
        self.out_b = qt[f"{prefix}/out/bias"].dequant()
        self.ctx = context_size
        if context_size > 1:
            # depthwise (ctx, 1, E) kernel → (ctx, E); fp32 (tiny).
            # bias-free, like the reference (stateless_predictor.py:46-55)
            self.conv_w = qt[f"{prefix}/conv/kernel"].dequant()[:, 0, :]

    def init_state(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, max(self.ctx - 1, 1)), jnp.int32)

    def step(self, params, token, state):
        del params
        tokens = jnp.concatenate(
            [state, token.astype(jnp.int32)[:, None]], axis=1)  # (B, ctx)
        h = self.embed.q[tokens]                                # gather
        if self.embed.is_quantized:
            h = h.astype(jnp.float32) * self.embed.scale
        if self.ctx > 1:
            h = jnp.einsum("bte,te->be", h, self.conv_w)
        else:
            h = h[:, -1]
        # no activation between conv and out — reference parity
        # (stateless_predictor.py:75-99; the joiner holds the nonlinearity)
        out = quant_dense(h, self.out_w, self.out_b)            # (B, D)
        return out[:, None, :], tokens[:, 1:]


class Int8LstmPredictor:
    """Int8 step function for models/predictor.py:LstmPredictor.

    Gate math mirrors flax LSTMCell exactly (params i{i,f,g,o}: input
    kernels, no bias; h{i,f,g,o}: hidden kernels + bias):
        i,f,o = σ(x·Wi* + h·Wh* + b*),  g = tanh(...)
        c' = f⊙c + i⊙g,  h' = o⊙tanh(c')
    Every gate matmul runs int8×int8→int32 on the MXU via quant_dense
    (matching onnxruntime quantize_dynamic's MatMul-only policy the
    reference applies to its exported predictor, rnnt_task.py:798-809)."""

    GATES = ("i", "f", "g", "o")

    def __init__(self, qt: Dict[str, QTensor], num_layers: int,
                 hidden_dim: int, prefix: str = "predictor"):
        self.embed = qt[f"{prefix}/embed/embedding"]
        self.out_w = qt[f"{prefix}/out/kernel"]
        self.out_b = qt[f"{prefix}/out/bias"].dequant()
        self.layers = []
        for l in range(num_layers):
            cell = f"{prefix}/rnns_{l}/cell"
            self.layers.append({
                g: (qt[f"{cell}/i{g}/kernel"], qt[f"{cell}/h{g}/kernel"],
                    qt[f"{cell}/h{g}/bias"].dequant())
                for g in self.GATES
            })
        self.hidden = hidden_dim
        self.n = num_layers

    def init_state(self, batch_size: int):
        z = jnp.zeros((batch_size, self.hidden), jnp.float32)
        return [(z, z) for _ in range(self.n)]  # (c, h) per layer

    def step(self, params, token, state):
        del params
        x = self.embed.q[token.astype(jnp.int32)]
        if self.embed.is_quantized:
            x = x.astype(jnp.float32) * self.embed.scale
        new_state = []
        for l, gates in enumerate(self.layers):
            c, h = state[l]
            h = h.astype(jnp.float32)
            acts = {}
            for g in self.GATES:
                iw, hw, hb = gates[g]
                acts[g] = quant_dense(x, iw, None) + quant_dense(h, hw, hb)
            i = jax.nn.sigmoid(acts["i"])
            f = jax.nn.sigmoid(acts["f"])
            gg = jnp.tanh(acts["g"])
            o = jax.nn.sigmoid(acts["o"])
            c = f * c.astype(jnp.float32) + i * gg
            h = o * jnp.tanh(c)
            new_state.append((c, h))
            x = h
        out = quant_dense(x, self.out_w, self.out_b)
        return out[:, None, :], new_state


def build_int8_predictor(qt: Dict[str, QTensor], predictor_model: str,
                         predictor_config: dict, prefix: str = "predictor"):
    """Int8 predictor step for either predictor family (drops the
    round-3 Stateless-only restriction)."""
    cfg = predictor_config or {}
    if predictor_model == "Stateless":
        return Int8StatelessPredictor(
            qt, context_size=int(cfg.get("context_size", 2)), prefix=prefix)
    if predictor_model == "Lstm":
        return Int8LstmPredictor(
            qt, num_layers=int(cfg.get("num_lstm_layers", 2)),
            hidden_dim=int(cfg.get("lstm_hidden_dim", 512)), prefix=prefix)
    raise ValueError(f"unknown predictor model {predictor_model!r}")


class Int8Joiner:
    """Int8 single-frame join for models/joiner.py:Joiner.streaming_step."""

    def __init__(self, qt: Dict[str, QTensor], activation: str = "relu",
                 use_out_project: bool = False, prefix: str = "joiner"):
        g = lambda n: qt[f"{prefix}/{n}/kernel"]
        b = lambda n: qt[f"{prefix}/{n}/bias"].dequant()
        self.enc_w, self.enc_b = g("enc_proj"), b("enc_proj")
        self.pre_w, self.pre_b = g("pre_proj"), b("pre_proj")
        self.act = jax.nn.relu if activation == "relu" else jnp.tanh
        self.use_out = use_out_project
        if use_out_project:
            self.oa_w, self.oa_b = g("out_proj_a"), b("out_proj_a")
            self.ob_w, self.ob_b = g("out_proj_b"), b("out_proj_b")

    def step(self, params, enc_frame, pred_out):
        del params
        am = quant_dense(enc_frame, self.enc_w, self.enc_b)
        lm = quant_dense(pred_out, self.pre_w, self.pre_b)
        h = self.act(am + lm)
        if self.use_out:
            h = quant_dense(h, self.oa_w, self.oa_b)
            h = quant_dense(h, self.ob_w, self.ob_b)
        return jax.nn.log_softmax(h.astype(jnp.float32), axis=-1)


class Int8RnntGreedyDecoding(RnntGreedyDecoding):
    """Greedy transducer decode whose predictor/joiner run int8-quantized.

    Built either from live params (quantized on the fly) or from the
    saved artifact (`export.save_quantized` → `np.load(...)`)."""

    def __init__(self, tokenizer, params_or_flat, predictor_config: dict,
                 joiner_config: dict, max_token_step: int = 1,
                 max_tokens: int = 256, min_size: int = 1024,
                 predictor_model: str = "Stateless"):
        qt = flat_qtree(params_or_flat, min_size=min_size)
        pred = build_int8_predictor(qt, predictor_model, predictor_config)
        join = Int8Joiner(
            qt, activation=joiner_config.get("activation", "relu"),
            use_out_project=bool(joiner_config.get("use_out_project",
                                                   True)))
        super().__init__(tokenizer, pred.step, pred.init_state, join.step,
                         max_token_step=max_token_step,
                         max_tokens=max_tokens)
        self.predictor = pred
        self.joiner = join


class Int8RnntBeamDecoding(RnntBeamDecoding):
    """Beam transducer decode on the int8 predictor/joiner step functions
    (the same batched lax.scan beam of decoding.py:RnntBeamDecoding; only
    the per-frame matmuls are quantized). Extends the reference, whose
    int8 path exists only for exported-ONNX greedy deployment."""

    def __init__(self, tokenizer, params_or_flat, predictor_config: dict,
                 joiner_config: dict, beam_size: int = 4,
                 cutoff_top_k: int = 4, max_tokens: int = 256,
                 min_size: int = 1024, predictor_model: str = "Stateless"):
        qt = flat_qtree(params_or_flat, min_size=min_size)
        pred = build_int8_predictor(qt, predictor_model, predictor_config)
        join = Int8Joiner(
            qt, activation=joiner_config.get("activation", "relu"),
            use_out_project=bool(joiner_config.get("use_out_project",
                                                   True)))
        super().__init__(tokenizer, pred.step, pred.init_state, join.step,
                         beam_size=beam_size, cutoff_top_k=cutoff_top_k,
                         max_tokens=max_tokens)
        self.predictor = pred
        self.joiner = join
