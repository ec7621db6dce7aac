"""Convert a local HuggingFace Wav2Vec2 checkpoint (safetensors) to a flax
param msgpack loadable via `encoder.config.pretrained_path`.

Torch-free: the safetensors container is parsed directly (8-byte LE header
length + JSON header + raw tensor bytes), so no torch install is needed to
port weights. Mirrors the reference capability of constructing the encoder
from HF pretrained weights (reference model/encoder/wav2vec2.py:25-43).

Usage:
    python -m speech2text_tpu.tools.convert_wav2vec2 \
        --input /path/model.safetensors --output w2v2.msgpack

The layout (base post-norm vs stable pre-norm; group vs layer feature
norm) is auto-detected from the tensor names. The classifier/quantizer
heads (ForCTC lm_head, quantizer, project_q/hid) are skipped; the task's
own `head` stays randomly initialized for finetuning.
"""

from __future__ import annotations

import argparse
import json
import struct
from typing import Dict

import numpy as np

_ST_DTYPES = {
    "F64": (np.float64, 8), "F32": (np.float32, 4), "F16": (np.float16, 2),
    "BF16": (None, 2), "I64": (np.int64, 8), "I32": (np.int32, 4),
    "I16": (np.int16, 2), "I8": (np.int8, 1), "U8": (np.uint8, 1),
    "BOOL": (np.bool_, 1),
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Parse a .safetensors file with numpy only (bf16 → float32)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        data = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt, itemsize = _ST_DTYPES[meta["dtype"]]
        lo, hi = meta["data_offsets"]
        raw = data[lo:hi]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=dt)
        out[name] = arr.reshape(meta["shape"]).copy()
    return out


def write_safetensors(tensors: Dict[str, np.ndarray], path: str) -> None:
    """Minimal safetensors writer (fixture/testing aid)."""
    rev = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
           np.dtype(np.float64): "F64", np.dtype(np.int64): "I64",
           np.dtype(np.int32): "I32"}
    header, blobs, off = {}, [], 0
    for name, arr in tensors.items():
        b = np.ascontiguousarray(arr).tobytes()
        header[name] = {"dtype": rev[arr.dtype], "shape": list(arr.shape),
                        "data_offsets": [off, off + len(b)]}
        blobs.append(b)
        off += len(b)
    hj = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)


def _compose_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v||, norm over the dims where g is broadcast (size 1)."""
    dims = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = np.sqrt(np.sum(np.square(v), axis=dims, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _lin(t, pre, dst, dst_name):
    dst[dst_name] = {"kernel": t[pre + ".weight"].T.astype(np.float32)}
    if pre + ".bias" in t:
        dst[dst_name]["bias"] = t[pre + ".bias"].astype(np.float32)


def _ln(t, pre, dst, dst_name):
    dst[dst_name] = {"scale": t[pre + ".weight"].astype(np.float32),
                     "bias": t[pre + ".bias"].astype(np.float32)}


def hf_to_flax(tensors: Dict[str, np.ndarray]) -> Dict:
    """Map HF Wav2Vec2Model tensor names onto the flax Wav2Vec2Encoder
    param tree (speech2text_tpu/models/wav2vec2.py)."""
    t = {}
    for k, v in tensors.items():
        k = k.removeprefix("wav2vec2.")
        # torch>=2 parametrized weight-norm names → classic names
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        t[k] = v

    stable = "encoder.layers.0.layer_norm.weight" in t and \
        "encoder.layers.1.feed_forward.intermediate_dense.weight" in t and \
        _detect_stable(t)
    params: Dict = {}

    # ---- feature extractor -------------------------------------------------
    fe: Dict = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in t:
        w = t[f"feature_extractor.conv_layers.{i}.conv.weight"]
        fe[f"conv{i}"] = {"kernel": w.transpose(2, 1, 0).astype(np.float32)}
        b = t.get(f"feature_extractor.conv_layers.{i}.conv.bias")
        if b is not None:
            fe[f"conv{i}"]["bias"] = b.astype(np.float32)
        if f"feature_extractor.conv_layers.{i}.layer_norm.weight" in t:
            _ln(t, f"feature_extractor.conv_layers.{i}.layer_norm", fe,
                f"norm{i}")
        i += 1
    params["feature_extractor"] = fe

    # ---- feature projection ------------------------------------------------
    _ln(t, "feature_projection.layer_norm", params, "fp_layer_norm")
    _lin(t, "feature_projection.projection", params, "feature_projection")

    # ---- positional conv (weight-normed, grouped) --------------------------
    g = t["encoder.pos_conv_embed.conv.weight_g"]
    v = t["encoder.pos_conv_embed.conv.weight_v"]
    w = _compose_weight_norm(g, v)  # (out, in/groups, k)
    params["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0).astype(np.float32),
        "bias": t["encoder.pos_conv_embed.conv.bias"].astype(np.float32),
    }
    _ln(t, "encoder.layer_norm", params, "encoder_layer_norm")

    # ---- transformer layers ------------------------------------------------
    i = 0
    while f"encoder.layers.{i}.attention.q_proj.weight" in t:
        pre = f"encoder.layers.{i}"
        attn: Dict = {}
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(t, f"{pre}.attention.{p}", attn, p)
        params[f"attn{i}"] = attn
        ffn: Dict = {}
        _lin(t, f"{pre}.feed_forward.intermediate_dense", ffn,
             "intermediate_dense")
        _lin(t, f"{pre}.feed_forward.output_dense", ffn, "output_dense")
        params[f"ffn{i}"] = ffn
        _ln(t, f"{pre}.layer_norm", params, f"layer_norm{i}")
        _ln(t, f"{pre}.final_layer_norm", params, f"final_layer_norm{i}")
        i += 1

    params["__layout__"] = {
        "num_layers": np.asarray(i, np.int32),
        "do_stable_layer_norm": np.asarray(int(stable), np.int32),
        "feat_extract_norm": np.asarray(
            int("feature_extractor.conv_layers.1.layer_norm.weight" in t),
            np.int32),  # 1 = "layer" mode
    }
    return params


def _detect_stable(t: Dict[str, np.ndarray]) -> bool:
    """Base vs stable layer-norm cannot be told from names alone (both have
    per-layer layer_norm/final_layer_norm); use the HF config convention
    that layer-norm feature extractors pair with stable layer norm."""
    return "feature_extractor.conv_layers.1.layer_norm.weight" in t


def load_pretrained(path: str) -> Dict:
    """Load a converted msgpack into a plain dict param tree (the
    `__layout__` metadata is stripped)."""
    from flax import serialization
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    tree.pop("__layout__", None)
    return tree


def convert(input_path: str, output_path: str) -> Dict:
    if input_path.endswith(".npz"):
        tensors = dict(np.load(input_path))
    else:
        tensors = read_safetensors(input_path)
    params = hf_to_flax(tensors)
    from flax import serialization
    with open(output_path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help=".safetensors or .npz HF checkpoint")
    ap.add_argument("--output", required=True, help="flax msgpack out path")
    args = ap.parse_args()
    params = convert(args.input, args.output)
    n = sum(x.size for x in _iter_leaves(params))
    print(f"wrote {args.output}: {n} parameters")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
