"""jaxpr → ONNX converter.

Traces a jax function with static example args and lowers the resulting
jaxpr to an ONNX graph (opset 17), with closed-over parameters baked as
initializers and every all-constant subexpression folded at export time.

This is the torch-ecosystem deployment surface the reference ships via
`torch.onnx.export` (reference task_factory/rnnt_task.py:753-809,
model/encoder/zipformer.py:665-898, model/predictor/
stateless_predictor.py:107-237, model/joiner/joiner.py:223-310). Here the
models are flax modules, so instead of per-module hand-written export
wrappers there is one generic jaxpr lowering that any jittable function
goes through — the same functions `export.py` serializes to StableHLO.

Coverage: the primitive set used by the ASR deployment trio (encoder
offline/streaming forward, predictor step, joiner step) plus general
elementwise/reduction/shape ops. Unsupported primitives raise with the
primitive name. Control-flow: `scan`/`while`/`cond` are rejected —
deployment graphs here are feed-forward per chunk (the streaming loop
lives in the host, exactly like sherpa-onnx drives the reference's
exported graphs).

All shapes are static (ONNX dims are concrete ints). bfloat16 inputs are
not supported — export deployment graphs in float32 (the exporter casts
params up front).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import proto


# ------------------------------------------------------------- builder

class _Builder:
    """Accumulates ONNX nodes/initializers with unique names."""

    def __init__(self, graph_name: str):
        self.graph_name = graph_name
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self._init_names: set = set()
        self._counter = 0
        # cache identical small constants (shape vectors etc.)
        self._const_cache: Dict[Tuple, str] = {}

    def fresh(self, hint: str) -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def add_node(self, op: str, inputs: Sequence[str], n_out: int = 1,
                 **attrs) -> List[str]:
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(proto.node_proto(
            op, list(inputs), outs, name=self.fresh(f"n_{op}"),
            attrs=attrs or None))
        return outs

    def add_initializer(self, name: str, arr: np.ndarray) -> str:
        if name in self._init_names:
            name = self.fresh(name)
        self._init_names.add(name)
        self.initializers.append(proto.tensor_proto(name, arr))
        return name

    def const(self, arr: np.ndarray, hint: str = "const") -> str:
        arr = np.asarray(arr)
        key: Tuple = ()
        if arr.size <= 64:
            key = (str(arr.dtype), arr.shape, arr.tobytes())
            if key in self._const_cache:
                return self._const_cache[key]
        name = self.add_initializer(self.fresh(hint), arr)
        if key:
            self._const_cache[key] = name
        return name

    def i64(self, values: Sequence[int], hint: str = "i64") -> str:
        return self.const(np.asarray(list(values), np.int64), hint)


class _Val:
    """A value flowing through conversion: an ONNX tensor name plus the
    jax aval (shape/dtype), or a compile-time numpy constant."""

    __slots__ = ("name", "const", "shape", "dtype")

    def __init__(self, shape, dtype, name=None, const=None):
        self.name = name
        self.const = const
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)

    @property
    def is_const(self) -> bool:
        return self.const is not None


def _np_of(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype == jnp.bfloat16:
        arr = arr.astype(np.float32)
    return arr


class _Ctx:
    def __init__(self, builder: _Builder):
        self.b = builder

    # Materialize a value as an ONNX tensor name (emitting a constant
    # initializer if it was folded).
    def name_of(self, v: _Val) -> str:
        if v.name is None:
            v.name = self.b.const(_np_of(v.const))
        return v.name


# ----------------------------------------------------- primitive handlers

_HANDLERS: Dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn
    return deco


def _out_val(ctx: _Ctx, eqn, name: str, i: int = 0) -> _Val:
    aval = eqn.outvars[i].aval
    return _Val(aval.shape, _onnx_np_dtype(aval.dtype), name=name)


def _onnx_np_dtype(dt) -> np.dtype:
    dt = np.dtype(dt)
    if dt == jnp.bfloat16:
        raise ValueError("bfloat16 graphs are not exportable to ONNX here; "
                         "build the deployment model with dtype=float32")
    return dt


_ELEMWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "and": "And", "or": "Or", "xor": "Xor",
    "neg": "Neg", "abs": "Abs", "exp": "Exp", "log": "Log",
    "sqrt": "Sqrt", "tanh": "Tanh", "logistic": "Sigmoid",
    "sign": "Sign", "sin": "Sin", "cos": "Cos", "floor": "Floor",
    "ceil": "Ceil", "erf": "Erf", "pow": "Pow", "not": "Not",
}


@_register(*_ELEMWISE)
def _h_elemwise(ctx, eqn, invals):
    op = _ELEMWISE[eqn.primitive.name]
    names = [ctx.name_of(v) for v in invals]
    (out,) = ctx.b.add_node(op, names)
    return [_out_val(ctx, eqn, out)]


@_register("log1p")
def _h_log1p(ctx, eqn, invals):
    x = ctx.name_of(invals[0])
    one = ctx.b.const(np.asarray(1, invals[0].dtype))
    (s,) = ctx.b.add_node("Add", [x, one])
    (out,) = ctx.b.add_node("Log", [s])
    return [_out_val(ctx, eqn, out)]


@_register("expm1")
def _h_expm1(ctx, eqn, invals):
    x = ctx.name_of(invals[0])
    (e,) = ctx.b.add_node("Exp", [x])
    one = ctx.b.const(np.asarray(1, invals[0].dtype))
    (out,) = ctx.b.add_node("Sub", [e, one])
    return [_out_val(ctx, eqn, out)]


@_register("rsqrt")
def _h_rsqrt(ctx, eqn, invals):
    x = ctx.name_of(invals[0])
    (s,) = ctx.b.add_node("Sqrt", [x])
    (out,) = ctx.b.add_node("Reciprocal", [s])
    return [_out_val(ctx, eqn, out)]


@_register("square")
def _h_square(ctx, eqn, invals):
    x = ctx.name_of(invals[0])
    (out,) = ctx.b.add_node("Mul", [x, x])
    return [_out_val(ctx, eqn, out)]


@_register("integer_pow")
def _h_integer_pow(ctx, eqn, invals):
    y = eqn.params["y"]
    x = ctx.name_of(invals[0])
    expo = ctx.b.const(np.asarray(y, invals[0].dtype))
    (out,) = ctx.b.add_node("Pow", [x, expo])
    return [_out_val(ctx, eqn, out)]


@_register("rem")
def _h_rem(ctx, eqn, invals):
    # lax.rem is C-style truncated remainder == ONNX Mod(fmod=1)
    names = [ctx.name_of(v) for v in invals]
    (out,) = ctx.b.add_node("Mod", names, fmod=1)
    return [_out_val(ctx, eqn, out)]


_COMPARE = {"gt": "Greater", "ge": "GreaterOrEqual",
            "lt": "Less", "le": "LessOrEqual", "eq": "Equal"}


@_register(*_COMPARE, "ne")
def _h_compare(ctx, eqn, invals):
    names = [ctx.name_of(v) for v in invals]
    if eqn.primitive.name == "ne":
        (e,) = ctx.b.add_node("Equal", names)
        (out,) = ctx.b.add_node("Not", [e])
    else:
        (out,) = ctx.b.add_node(_COMPARE[eqn.primitive.name], names)
    return [_out_val(ctx, eqn, out)]


@_register("select_n")
def _h_select_n(ctx, eqn, invals):
    pred, *cases = invals
    if len(cases) != 2 or pred.dtype != np.bool_:
        raise NotImplementedError("select_n with >2 cases")
    # select_n(pred, on_false, on_true): Where picks X when cond is true
    (out,) = ctx.b.add_node("Where", [ctx.name_of(pred),
                                      ctx.name_of(cases[1]),
                                      ctx.name_of(cases[0])])
    return [_out_val(ctx, eqn, out)]


@_register("clamp")
def _h_clamp(ctx, eqn, invals):
    lo, x, hi = invals
    if lo.shape == () and hi.shape == ():
        (out,) = ctx.b.add_node("Clip", [ctx.name_of(x), ctx.name_of(lo),
                                         ctx.name_of(hi)])
    else:
        (m,) = ctx.b.add_node("Min", [ctx.name_of(x), ctx.name_of(hi)])
        (out,) = ctx.b.add_node("Max", [m, ctx.name_of(lo)])
    return [_out_val(ctx, eqn, out)]


@_register("convert_element_type")
def _h_convert(ctx, eqn, invals):
    to = _onnx_np_dtype(eqn.params["new_dtype"])
    (out,) = ctx.b.add_node("Cast", [ctx.name_of(invals[0])],
                            to=proto.np_to_onnx_dtype(to))
    return [_out_val(ctx, eqn, out)]


@_register("stop_gradient", "copy", "name")
def _h_identity(ctx, eqn, invals):
    # "name": jax.ad_checkpoint.checkpoint_name tags (remat policy
    # bookkeeping, e.g. the zipformer's "attn_weights") — pure identity
    # outside jax.checkpoint, so it lowers to Identity.
    (out,) = ctx.b.add_node("Identity", [ctx.name_of(invals[0])])
    return [_out_val(ctx, eqn, out)]


@_register("reshape")
def _h_reshape(ctx, eqn, invals):
    if eqn.params.get("dimensions") is not None:
        raise NotImplementedError("reshape with dimensions (fused "
                                  "transpose)")
    shape = eqn.outvars[0].aval.shape
    sh = ctx.b.i64(shape, "shape")
    (out,) = ctx.b.add_node("Reshape", [ctx.name_of(invals[0]), sh])
    return [_out_val(ctx, eqn, out)]


@_register("squeeze", "expand_dims")
def _h_squeeze(ctx, eqn, invals):
    shape = eqn.outvars[0].aval.shape
    sh = ctx.b.i64(shape, "shape")
    (out,) = ctx.b.add_node("Reshape", [ctx.name_of(invals[0]), sh])
    return [_out_val(ctx, eqn, out)]


@_register("transpose")
def _h_transpose(ctx, eqn, invals):
    perm = [int(p) for p in eqn.params["permutation"]]
    (out,) = ctx.b.add_node("Transpose", [ctx.name_of(invals[0])],
                            perm=perm)
    return [_out_val(ctx, eqn, out)]


@_register("broadcast_in_dim")
def _h_broadcast(ctx, eqn, invals):
    x = invals[0]
    out_shape = [int(s) for s in eqn.params["shape"]]
    bdims = [int(d) for d in eqn.params["broadcast_dimensions"]]
    # interim: out rank with 1s everywhere except the mapped input dims
    interim = [1] * len(out_shape)
    for i, d in enumerate(bdims):
        interim[d] = x.shape[i]
    name = ctx.name_of(x)
    if tuple(interim) != x.shape:
        sh = ctx.b.i64(interim, "shape")
        (name,) = ctx.b.add_node("Reshape", [name, sh])
    if interim != out_shape:
        sh = ctx.b.i64(out_shape, "shape")
        (name,) = ctx.b.add_node("Expand", [name, sh])
    elif tuple(interim) == x.shape:
        (name,) = ctx.b.add_node("Identity", [name])
    return [_out_val(ctx, eqn, name)]


@_register("concatenate")
def _h_concat(ctx, eqn, invals):
    axis = int(eqn.params["dimension"])
    names = [ctx.name_of(v) for v in invals]
    (out,) = ctx.b.add_node("Concat", names, axis=axis)
    return [_out_val(ctx, eqn, out)]


@_register("slice")
def _h_slice(ctx, eqn, invals):
    starts = [int(s) for s in eqn.params["start_indices"]]
    ends = [int(s) for s in eqn.params["limit_indices"]]
    strides = eqn.params["strides"]
    steps = ([int(s) for s in strides] if strides is not None
             else [1] * len(starts))
    axes = list(range(len(starts)))
    (out,) = ctx.b.add_node("Slice", [
        ctx.name_of(invals[0]), ctx.b.i64(starts, "starts"),
        ctx.b.i64(ends, "ends"), ctx.b.i64(axes, "axes"),
        ctx.b.i64(steps, "steps")])
    return [_out_val(ctx, eqn, out)]


@_register("rev")
def _h_rev(ctx, eqn, invals):
    dims = [int(d) for d in eqn.params["dimensions"]]
    n = len(dims)
    int64_min = -(2 ** 63)
    (out,) = ctx.b.add_node("Slice", [
        ctx.name_of(invals[0]), ctx.b.i64([-1] * n, "starts"),
        ctx.b.i64([int64_min] * n, "ends"), ctx.b.i64(dims, "axes"),
        ctx.b.i64([-1] * n, "steps")])
    return [_out_val(ctx, eqn, out)]


@_register("pad")
def _h_pad(ctx, eqn, invals):
    x, pad_val = invals
    cfg = [(int(lo), int(hi), int(interior))
           for lo, hi, interior in eqn.params["padding_config"]]
    if any(i != 0 for _, _, i in cfg):
        raise NotImplementedError("interior (dilating) pad")
    name = ctx.name_of(x)
    rank = len(x.shape)
    pos = [(max(lo, 0), max(hi, 0)) for lo, hi, _ in cfg]
    neg = [(min(lo, 0), min(hi, 0)) for lo, hi, _ in cfg]
    if any(p != (0, 0) for p in pos):
        pads = [p[0] for p in pos] + [p[1] for p in pos]
        (name,) = ctx.b.add_node("Pad", [
            name, ctx.b.i64(pads, "pads"), ctx.name_of(pad_val)],
            mode="constant")
    if any(v != (0, 0) for v in neg):
        starts = [-lo for lo, _ in neg]
        cur = [x.shape[d] + pos[d][0] + pos[d][1] for d in range(rank)]
        ends = [cur[d] + neg[d][1] for d in range(rank)]
        (name,) = ctx.b.add_node("Slice", [
            name, ctx.b.i64(starts, "starts"), ctx.b.i64(ends, "ends"),
            ctx.b.i64(list(range(rank)), "axes"),
            ctx.b.i64([1] * rank, "steps")])
    if all(p == (0, 0) for p in pos) and all(v == (0, 0) for v in neg):
        (name,) = ctx.b.add_node("Identity", [name])
    return [_out_val(ctx, eqn, name)]


@_register("split")
def _h_split(ctx, eqn, invals):
    axis = int(eqn.params["axis"])
    sizes = [int(s) for s in eqn.params["sizes"]]
    outs = ctx.b.add_node("Split", [ctx.name_of(invals[0]),
                                    ctx.b.i64(sizes, "split")],
                          n_out=len(sizes), axis=axis)
    return [_out_val(ctx, eqn, o, i) for i, o in enumerate(outs)]


def _reduce(ctx, eqn, invals, op, axes_as_input):
    axes = [int(a) for a in eqn.params["axes"]]
    x = ctx.name_of(invals[0])
    if axes_as_input:
        (out,) = ctx.b.add_node(op, [x, ctx.b.i64(axes, "axes")],
                                keepdims=0)
    else:
        (out,) = ctx.b.add_node(op, [x], axes=axes, keepdims=0)
    return [_out_val(ctx, eqn, out)]


@_register("reduce_sum")
def _h_reduce_sum(ctx, eqn, invals):
    # opset 13+: ReduceSum takes axes as an input
    return _reduce(ctx, eqn, invals, "ReduceSum", axes_as_input=True)


@_register("reduce_max")
def _h_reduce_max(ctx, eqn, invals):
    return _reduce(ctx, eqn, invals, "ReduceMax", axes_as_input=False)


@_register("reduce_min")
def _h_reduce_min(ctx, eqn, invals):
    return _reduce(ctx, eqn, invals, "ReduceMin", axes_as_input=False)


@_register("reduce_prod")
def _h_reduce_prod(ctx, eqn, invals):
    return _reduce(ctx, eqn, invals, "ReduceProd", axes_as_input=False)


@_register("reduce_and", "reduce_or")
def _h_reduce_bool(ctx, eqn, invals):
    x = ctx.name_of(invals[0])
    (xi,) = ctx.b.add_node("Cast", [x], to=proto.INT32)
    axes = [int(a) for a in eqn.params["axes"]]
    op = "ReduceMin" if eqn.primitive.name == "reduce_and" else "ReduceMax"
    (r,) = ctx.b.add_node(op, [xi], axes=axes, keepdims=0)
    (out,) = ctx.b.add_node("Cast", [r], to=proto.BOOL)
    return [_out_val(ctx, eqn, out)]


@_register("argmax", "argmin")
def _h_argmax(ctx, eqn, invals):
    axes = eqn.params["axes"]
    if len(axes) != 1:
        raise NotImplementedError("argmax over multiple axes")
    op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    (r,) = ctx.b.add_node(op, [ctx.name_of(invals[0])],
                          axis=int(axes[0]), keepdims=0)
    out_dt = _onnx_np_dtype(eqn.outvars[0].aval.dtype)
    (out,) = ctx.b.add_node("Cast", [r], to=proto.np_to_onnx_dtype(out_dt))
    return [_out_val(ctx, eqn, out)]


@_register("dot_general")
def _h_dot_general(ctx, eqn, invals):
    lhs, rhs = invals
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    lc, rc, lb, rb = (tuple(int(i) for i in t) for t in (lc, rc, lb, rb))
    ln, rn = len(lhs.shape), len(rhs.shape)
    names = [ctx.name_of(lhs), ctx.name_of(rhs)]

    # fast path → MatMul: leading aligned batch dims, single contraction
    # over lhs-last / rhs-second-to-last (or rhs-first when rhs is 2D)
    plain = (lb == tuple(range(len(lb))) and rb == tuple(range(len(rb)))
             and lc == (ln - 1,)
             and rc == ((rn - 2,) if rn - len(rb) >= 2 else (rn - 1,)))
    if plain:
        (out,) = ctx.b.add_node("MatMul", names)
        return [_out_val(ctx, eqn, out)]

    # general path → Einsum
    letters = "abcdefghijklmnopqrstuvwxyz"
    it = iter(letters)
    l_sub = [""] * ln
    r_sub = [""] * rn
    for i, j in zip(lb, rb):
        c = next(it)
        l_sub[i] = c
        r_sub[j] = c
    for i, j in zip(lc, rc):
        c = next(it)
        l_sub[i] = c
        r_sub[j] = c
    for i in range(ln):
        if not l_sub[i]:
            l_sub[i] = next(it)
    for j in range(rn):
        if not r_sub[j]:
            r_sub[j] = next(it)
    out_sub = ([l_sub[i] for i in lb]
               + [l_sub[i] for i in range(ln) if i not in lb + lc]
               + [r_sub[j] for j in range(rn) if j not in rb + rc])
    eqn_str = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out_sub)}"
    (out,) = ctx.b.add_node("Einsum", names, equation=eqn_str)
    return [_out_val(ctx, eqn, out)]


@_register("conv_general_dilated")
def _h_conv(ctx, eqn, invals):
    lhs, rhs = invals
    dn = eqn.params["dimension_numbers"]
    strides = [int(s) for s in eqn.params["window_strides"]]
    padding = [(int(lo), int(hi)) for lo, hi in eqn.params["padding"]]
    lhs_dil = eqn.params["lhs_dilation"]
    rhs_dil = [int(d) for d in eqn.params["rhs_dilation"]]
    groups = int(eqn.params["feature_group_count"])
    if int(eqn.params["batch_group_count"]) != 1:
        raise NotImplementedError("batch_group_count != 1")
    if lhs_dil is not None and any(int(d) != 1 for d in lhs_dil):
        raise NotImplementedError("transposed conv (lhs_dilation)")

    # jax dn: (lhs_spec, rhs_spec, out_spec) as dim index tuples
    lspec, rspec, ospec = dn
    nsp = len(strides)
    # transpose lhs to (N, C, spatial...)
    l_perm = [lspec[0], lspec[1]] + list(lspec[2:])
    x = ctx.name_of(lhs)
    if l_perm != list(range(len(lhs.shape))):
        (x,) = ctx.b.add_node("Transpose", [x], perm=l_perm)
    # transpose rhs to (O, I, spatial...)
    r_perm = [rspec[0], rspec[1]] + list(rspec[2:])
    w = ctx.name_of(rhs)
    if r_perm != list(range(len(rhs.shape))):
        (w,) = ctx.b.add_node("Transpose", [w], perm=r_perm)
    pads = [p[0] for p in padding] + [p[1] for p in padding]
    (y,) = ctx.b.add_node("Conv", [x, w], strides=strides, pads=pads,
                          dilations=rhs_dil, group=groups)
    # y is (N, O, spatial...); transpose to out_spec order
    # out_spec maps (N, C, spatial...) logical dims to positions
    inv = [0] * (nsp + 2)
    for logical, pos in enumerate([ospec[0], ospec[1]] + list(ospec[2:])):
        inv[pos] = logical
    if inv != list(range(nsp + 2)):
        (y,) = ctx.b.add_node("Transpose", [y], perm=inv)
    return [_out_val(ctx, eqn, y)]


@_register("gather")
def _h_gather(ctx, eqn, invals):
    operand, indices = invals
    d = eqn.params["dimension_numbers"]
    slice_sizes = tuple(int(s) for s in eqn.params["slice_sizes"])
    rank = len(operand.shape)
    # Pattern: single-axis integer-array indexing (jnp.take / x[..., idx]
    # on one axis a) — what ONNX Gather(axis=a) computes:
    #   start_index_map == collapsed_slice_dims == (a,), no batching dims,
    #   slice_sizes full except axis a == 1, index_vector_dim last
    #   (indices shaped (..., 1)), and the index batch dims land
    #   contiguously at position a of the output (offset_dims are the
    #   remaining operand dims in order).
    ok = (len(d.start_index_map) == 1
          and tuple(d.collapsed_slice_dims) == tuple(d.start_index_map)
          and not getattr(d, "operand_batching_dims", ())
          and not getattr(d, "start_indices_batching_dims", ())
          and indices.shape and indices.shape[-1] == 1)
    if ok:
        a = int(d.start_index_map[0])
        full = tuple(operand.shape[i] if i != a else 1 for i in range(rank))
        nb = len(indices.shape) - 1              # index batch dims
        out_rank = rank - 1 + nb
        expected_offsets = tuple(dd for dd in range(out_rank)
                                 if not (a <= dd < a + nb))
        ok = (slice_sizes == full
              and tuple(d.offset_dims) == expected_offsets)
    if not ok:
        raise NotImplementedError(f"general gather {d} sizes={slice_sizes}")
    idx_shape = indices.shape[:-1]
    idx = ctx.name_of(indices)
    sh = ctx.b.i64(idx_shape if idx_shape else (1,), "shape")
    (idx,) = ctx.b.add_node("Reshape", [idx, sh])
    (out,) = ctx.b.add_node("Gather", [ctx.name_of(operand), idx], axis=a)
    if not idx_shape:
        sh2 = ctx.b.i64(eqn.outvars[0].aval.shape, "shape")
        (out,) = ctx.b.add_node("Reshape", [out, sh2])
    return [_out_val(ctx, eqn, out)]


@_register("dynamic_slice")
def _h_dynamic_slice(ctx, eqn, invals):
    x, *starts = invals
    sizes = [int(s) for s in eqn.params["slice_sizes"]]
    rank = len(x.shape)
    # build starts vector (int64) from scalar operands
    parts = []
    for s in starts:
        nm = ctx.name_of(s)
        (c,) = ctx.b.add_node("Cast", [nm], to=proto.INT64)
        sh = ctx.b.i64([1], "shape")
        (r,) = ctx.b.add_node("Reshape", [c, sh])
        parts.append(r)
    (st,) = ctx.b.add_node("Concat", parts, axis=0)
    # clamp starts to [0, dim - size] (lax.dynamic_slice semantics)
    lo = ctx.b.i64([0] * rank, "lo")
    hi = ctx.b.i64([x.shape[i] - sizes[i] for i in range(rank)], "hi")
    (st,) = ctx.b.add_node("Clip", [st, lo, hi])
    (en,) = ctx.b.add_node("Add", [st, ctx.b.i64(sizes, "sizes")])
    (out,) = ctx.b.add_node("Slice", [
        ctx.name_of(x), st, en, ctx.b.i64(list(range(rank)), "axes"),
        ctx.b.i64([1] * rank, "steps")])
    return [_out_val(ctx, eqn, out)]


@_register("iota")
def _h_iota(ctx, eqn, invals):
    # no operands — reached only when folding is disabled; emit a constant
    p = eqn.params
    shape = tuple(int(s) for s in p["shape"])
    dt = _onnx_np_dtype(p["dtype"])
    dim = int(p["dimension"])
    ar = np.arange(shape[dim], dtype=dt)
    ar = np.broadcast_to(
        ar.reshape([-1 if i == dim else 1 for i in range(len(shape))]),
        shape)
    return [_Val(shape, dt, const=ar)]


# --------------------------------------------------------------- driver

_INLINE_CALLS = ("pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
                 "custom_vjp_call", "custom_vjp_call_jaxpr", "remat",
                 "checkpoint", "custom_jvp_call_jaxpr")


def _inline_target(eqn):
    p = eqn.params
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p and p[key] is not None:
            return p[key]
    return None


def _fold(eqn, invals: List[_Val]) -> Optional[List[_Val]]:
    """Evaluate an equation whose inputs are all constants."""
    if eqn.primitive.name in _INLINE_CALLS or eqn.primitive.name in (
            "scan", "while", "cond"):
        return None
    try:
        vals = [jnp.asarray(v.const) for v in invals]
        subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
        out = eqn.primitive.bind(*subfuns, *vals, **bind_params)
    except Exception:
        return None
    outs = out if eqn.primitive.multiple_results else [out]
    return [_Val(o.shape, np.asarray(o).dtype, const=np.asarray(o))
            for o in outs]


def convert(fn: Callable, example_args: Sequence[Any],
            graph_name: str = "graph",
            input_names: Optional[Sequence[str]] = None,
            output_names: Optional[Sequence[str]] = None,
            metadata: Optional[Dict[str, str]] = None,
            opset: int = 17) -> bytes:
    """Trace `fn(*example_args)` and lower to a serialized ONNX ModelProto.

    Closure constants (model parameters) become initializers; bfloat16
    constants are cast to float32. Positional args become graph inputs
    (flattened in pytree order when they are containers)."""
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    b = _Builder(graph_name)
    ctx = _Ctx(b)

    env: Dict[Any, _Val] = {}

    flat_args, _ = jax.tree_util.tree_flatten(tuple(example_args))
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(flat_args))]
    if len(input_names) != len(jaxpr.invars):
        raise ValueError(f"{len(jaxpr.invars)} graph inputs but "
                         f"{len(input_names)} names")
    graph_inputs = []
    for name, var in zip(input_names, jaxpr.invars):
        aval = var.aval
        dt = _onnx_np_dtype(aval.dtype)
        env[var] = _Val(aval.shape, dt, name=name)
        graph_inputs.append(proto.value_info_proto(
            name, proto.np_to_onnx_dtype(dt), aval.shape))

    for cvar, cval in zip(jaxpr.constvars, closed.consts):
        env[cvar] = _Val(np.shape(cval), _np_of(cval).dtype,
                         const=_np_of(cval))

    def read(v) -> _Val:
        if hasattr(v, "val"):                   # Literal
            arr = _np_of(v.val)
            return _Val(arr.shape, arr.dtype, const=arr)
        return env[v]

    def run_jaxpr(jx, in_vals: List[_Val], consts: List[_Val]):
        local: Dict[Any, _Val] = {}
        for var, val in zip(jx.constvars, consts):
            local[var] = val

        def rd(v):
            if hasattr(v, "val"):
                arr = _np_of(v.val)
                return _Val(arr.shape, arr.dtype, const=arr)
            return local[v]

        for var, val in zip(jx.invars, in_vals):
            local[var] = val
        for eqn in jx.eqns:
            invals = [rd(v) for v in eqn.invars]
            outs = _emit(eqn, invals)
            for var, val in zip(eqn.outvars, outs):
                local[var] = val
        return [rd(v) for v in jx.outvars]

    def _emit(eqn, invals: List[_Val]) -> List[_Val]:
        name = eqn.primitive.name
        target = _inline_target(eqn)
        if name in _INLINE_CALLS or (target is not None and name not in
                                     ("scan", "while", "cond")):
            if target is None:
                raise NotImplementedError(f"call primitive {name} "
                                          f"without inlineable jaxpr")
            inner = target.jaxpr if hasattr(target, "jaxpr") else target
            consts = [(_Val(np.shape(c), _np_of(c).dtype, const=_np_of(c)))
                      for c in getattr(target, "consts", [])]
            if name.startswith("custom_jvp") or name.startswith("custom_vjp"):
                # leading operands may include the rule fns — jaxpr invars
                # count tells how many real operands there are
                invals = invals[len(invals) - len(inner.invars):]
            return run_jaxpr(inner, invals, consts)
        if all(v.is_const for v in invals):
            folded = _fold(eqn, invals)
            if folded is not None:
                return folded
        if name not in _HANDLERS:
            raise NotImplementedError(
                f"primitive '{name}' is not supported by the ONNX "
                f"exporter (params: {list(eqn.params)})")
        return _HANDLERS[name](ctx, eqn, invals)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        outs = _emit(eqn, invals)
        for var, val in zip(eqn.outvars, outs):
            env[var] = val

    out_vals = [read(v) for v in jaxpr.outvars]
    if output_names is None:
        output_names = [f"output_{i}" for i in range(len(out_vals))]
    graph_outputs = []
    for name, val in zip(output_names, out_vals):
        src = ctx.name_of(val)
        b.nodes.append(proto.node_proto("Identity", [src], [name],
                                        name=b.fresh("n_out")))
        graph_outputs.append(proto.value_info_proto(
            name, proto.np_to_onnx_dtype(val.dtype), val.shape))

    g = proto.graph_proto(graph_name, b.nodes, b.initializers,
                          graph_inputs, graph_outputs)
    return proto.model_proto(g, opset=opset, metadata=metadata)
