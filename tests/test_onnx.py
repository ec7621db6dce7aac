"""ONNX export: writer/reader, jaxpr converter, evaluator, int8 quant.

Deployment parity with the reference's ONNX surface (reference
task_factory/rnnt_task.py:753-809 exports streaming encoder + stateless
predictor + joiner ONNX plus onnxruntime dynamic-int8 variants). The
rebuild emits the same artifacts via a hand-rolled protobuf writer and a
generic jaxpr lowering; every test executes the *serialized bytes*
through the numpy evaluator — writer, converter, reader, and runner are
all on the line in each parity assertion.

The wire format itself is cross-validated against `protoc`-generated
bindings compiled from tools/onnx_schema.proto when a compatible
protobuf runtime is available.
"""

import os
import subprocess
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech2text_tpu.onnx import OnnxRunner, convert, quantize_dynamic
from speech2text_tpu.onnx import proto

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(model_bytes, *args):
    return OnnxRunner(model_bytes)(*[np.asarray(a) for a in args])


def _ref(fn, *args):
    with jax.default_matmul_precision("highest"):
        out = fn(*args)
    return [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]


def _check(fn, args, rtol=1e-5, atol=1e-5, name="g"):
    model = convert(fn, args, name)
    got = _run(model, *jax.tree_util.tree_leaves(tuple(args)))
    want = _ref(fn, *args)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w.dtype == np.bool_ or np.issubdtype(w.dtype, np.integer):
            np.testing.assert_array_equal(g.astype(w.dtype), w)
        else:
            np.testing.assert_allclose(g, w, rtol=rtol, atol=atol)
    return model


# ------------------------------------------------------------ proto layer

@pytest.mark.quick
def test_proto_roundtrip_internal():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    t = proto.tensor_proto("w", arr)
    name, back = proto.parse_tensor(t)
    assert name == "w"
    np.testing.assert_array_equal(back, arr)

    n = proto.node_proto("Conv", ["x", "w"], ["y"], name="c1",
                         attrs={"strides": [1, 2], "group": 3,
                                "alpha": 0.5, "mode": "constant"})
    node = proto.parse_node(n)
    assert node.op_type == "Conv"
    assert node.inputs == ["x", "w"] and node.outputs == ["y"]
    assert node.attrs["strides"] == [1, 2]
    assert node.attrs["group"] == 3
    assert abs(node.attrs["alpha"] - 0.5) < 1e-9
    assert node.attrs["mode"] == "constant"

    g = proto.graph_proto(
        "g", [n], [t],
        [proto.value_info_proto("x", proto.FLOAT, (1, 2))],
        [proto.value_info_proto("y", proto.FLOAT, (1, 3))])
    m = proto.model_proto(g, opset=17, metadata={"k": "v"})
    model = proto.parse_model(m)
    assert model.ir_version == 8 and model.opset == 17
    assert model.metadata == {"k": "v"}
    assert model.graph.name == "g"
    assert [x[0] for x in model.graph.inputs] == ["x"]
    assert model.graph.inputs[0][2] == [1, 2]
    assert "w" in model.graph.initializers


def _protoc_bindings():
    """Compile tools/onnx_schema.proto with protoc; import the module."""
    tmp = tempfile.mkdtemp(prefix="onnx_pb_")
    schema = os.path.join(REPO, "tools", "onnx_schema.proto")
    r = subprocess.run(
        ["protoc", f"--proto_path={os.path.dirname(schema)}",
         f"--python_out={tmp}", os.path.basename(schema)],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"protoc unavailable/failed: {r.stderr[:200]}")
    sys.path.insert(0, tmp)
    try:
        import onnx_schema_pb2  # noqa: F401
        return onnx_schema_pb2
    except Exception as e:                       # runtime/gencode mismatch
        pytest.skip(f"protobuf runtime incompatible: {e!r}")
    finally:
        sys.path.remove(tmp)


@pytest.mark.quick
def test_proto_cross_validated_against_protoc():
    """Bytes written by proto.py parse identically through real protobuf
    bindings generated from the transcribed ONNX schema — catching any
    field-number or wire-type mistake in the hand-rolled writer."""
    pb2 = _protoc_bindings()
    arr = np.asarray([[1.5, -2.0], [0.0, 3.25]], np.float32)
    graph = proto.graph_proto(
        "g",
        [proto.node_proto("MatMul", ["x", "w"], ["y"], name="mm",
                          attrs={"ints_attr": [3, -1],
                                 "f_attr": 0.25, "s_attr": "hello"})],
        [proto.tensor_proto("w", arr)],
        [proto.value_info_proto("x", proto.FLOAT, (4, 2))],
        [proto.value_info_proto("y", proto.FLOAT, (4, 2))])
    data = proto.model_proto(graph, opset=17, metadata={"a": "b"})

    m = pb2.ModelProto()
    m.ParseFromString(data)
    assert m.ir_version == 8
    assert m.producer_name == "speech2text_tpu"
    assert m.opset_import[0].version == 17
    assert m.metadata_props[0].key == "a"
    assert m.metadata_props[0].value == "b"
    g = m.graph
    assert g.name == "g"
    node = g.node[0]
    assert node.op_type == "MatMul"
    assert list(node.input) == ["x", "w"]
    attrs = {a.name: a for a in node.attribute}
    assert list(attrs["ints_attr"].ints) == [3, -1]
    assert attrs["ints_attr"].type == pb2.AttributeProto.INTS
    assert abs(attrs["f_attr"].f - 0.25) < 1e-9
    assert attrs["s_attr"].s == b"hello"
    init = g.initializer[0]
    assert init.name == "w"
    assert list(init.dims) == [2, 2]
    assert init.data_type == pb2.TensorProto.FLOAT
    np.testing.assert_array_equal(
        np.frombuffer(init.raw_data, np.float32).reshape(2, 2), arr)
    vi = g.input[0]
    assert vi.name == "x"
    assert vi.type.tensor_type.elem_type == pb2.TensorProto.FLOAT
    assert [d.dim_value for d in vi.type.tensor_type.shape.dim] == [4, 2]

    # and the reverse: protoc-serialized bytes parse through proto.py
    data2 = m.SerializeToString()
    model2 = proto.parse_model(data2)
    assert model2.opset == 17
    assert model2.graph.nodes[0].op_type == "MatMul"
    np.testing.assert_array_equal(model2.graph.initializers["w"], arr)


# ------------------------------------------------------- converter coverage

@pytest.mark.quick
def test_convert_mlp_softmax():
    rng = np.random.default_rng(0)
    W1 = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

    def mlp(x):
        h = jnp.tanh(x @ W1)
        y = jax.nn.softmax(h @ W2 + b, axis=-1)
        return jnp.log(y + 1e-6), jnp.argmax(y, axis=-1)

    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    _check(mlp, (x,), name="mlp")


@pytest.mark.quick
def test_convert_conv_shape_ops():
    rng = np.random.default_rng(1)
    K = jnp.asarray(rng.standard_normal((3, 4, 6)) * 0.3, jnp.float32)

    def net(x):
        y = jax.lax.conv_general_dilated(
            x, K, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))
        y = jax.nn.relu(y)
        y = y[:, ::2]
        y = jnp.concatenate([y, -y], axis=-1)
        y = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))
        return y.mean(axis=1), jnp.flip(y, axis=1)

    x = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    _check(net, (x,), name="conv")


@pytest.mark.quick
def test_convert_depthwise_conv():
    rng = np.random.default_rng(2)
    Kd = jnp.asarray(rng.standard_normal((5, 1, 6)) * 0.3, jnp.float32)

    def net(x):                                  # depthwise: groups == C
        return jax.lax.conv_general_dilated(
            x, Kd, (2,), [(2, 2)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=6)

    x = jnp.asarray(rng.standard_normal((2, 12, 6)), jnp.float32)
    _check(net, (x,), name="dwconv")


@pytest.mark.quick
def test_convert_gather_dynslice_where():
    rng = np.random.default_rng(3)
    E = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)

    def fn(idx, start):
        v = jnp.take(E, idx, axis=0)             # axis-0 embedding gather
        g2 = E[:, jnp.asarray([1, 3, 5])]        # non-zero-axis gather
        w = jax.lax.dynamic_slice(
            v, (start, jnp.int32(0), jnp.int32(0)), (2, 2, 8))
        m = jnp.where(v > 0, v, -v)
        return v.sum(-1), w, m.max(), g2

    idx = jnp.asarray([[1, 5], [3, 19], [0, 2]], jnp.int32)
    _check(fn, (idx, jnp.int32(1)), name="gather")


@pytest.mark.quick
def test_convert_misc_elementwise():
    rng = np.random.default_rng(4)

    def fn(x):
        parts = jnp.split(x, [2, 5], axis=1)
        a = jnp.log1p(jnp.exp(-jnp.abs(x)))          # swoosh-style pieces
        b = jax.nn.sigmoid(x) * jnp.sqrt(jnp.abs(x) + 1.0)
        c = jnp.clip(x, -0.5, 0.7)
        d = (x > 0).astype(jnp.float32) - (x <= 0.1).astype(jnp.float32)
        e = jnp.minimum(jnp.maximum(x, -1.0), 1.0) ** 3
        f = jnp.sign(x) * jax.lax.rem(x, jnp.full_like(x, 0.3))
        return parts[0], parts[2], a, b, c, d, e, f, x.T

    x = jnp.asarray(rng.standard_normal((4, 7)), jnp.float32)
    _check(fn, (x,), name="misc")


# ------------------------------------------------------------- int8 quant

@pytest.mark.quick
def test_dynamic_quant_matmul_and_gather():
    rng = np.random.default_rng(5)
    W = jnp.asarray(rng.standard_normal((64, 48)) * 0.2, jnp.float32)
    E = jnp.asarray(rng.standard_normal((100, 64)) * 0.5, jnp.float32)

    def fn(idx):
        v = jnp.take(E, idx, axis=0)
        return v @ W

    idx = jnp.asarray([[3, 7, 50], [99, 0, 11]], jnp.int32)
    model = convert(fn, (idx,), "qnet")
    qmodel = quantize_dynamic(model, ["MatMul", "Gather"])

    # quantized graph really stores int8 weights (4x smaller payloads)
    qg = proto.parse_model(qmodel).graph
    q_inits = {k: v for k, v in qg.initializers.items()
               if v.dtype == np.int8 and v.size > 16}
    assert len(q_inits) == 2, f"expected 2 int8 weights, got {q_inits.keys()}"
    assert not any(v.dtype == np.float32 and v.size > 1000
                   for v in qg.initializers.values()), \
        "fp32 payloads should be dropped after quantization"
    assert len(qmodel) < 0.5 * len(model)

    want = _ref(fn, idx)[0]
    got = _run(qmodel, idx)[0]
    # int8 dynamic quant error bound: ~1% of weight-scale product
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * max(scale, 1.0)


# ------------------------------------------------------- task-level parity

VOCAB = 31
CFG = {
    "tokenizer": {"type": "char", "config": {}},
    "dataset": {"feat_type": "lhotes_fbank",
                "feat_config": {"num_mel_bins": 80},
                "data_aug_config": {}},
    "metric": {"decode_method": "rnnt_greedy_search",
               "encoder_streaming": True,
               "streaming_chunk_size": 8,
               "streaming_left_chunks": 4},
    "encoder": {"model": "Zipformer", "config": {
        "feature_dim": 80, "downsampling_factor": [1, 2],
        "num_encoder_layers": [1, 1], "feedforward_dim": [64, 64],
        "encoder_dim": [32, 32], "encoder_unmasked_dim": [24, 24],
        "num_heads": [2, 2], "query_head_dim": 8, "value_head_dim": 8,
        "pos_head_dim": 4, "pos_dim": 16, "cnn_module_kernel": [7, 7],
        "causal": True, "chunk_size": [8], "left_context_frames": [32],
        "dropout": 0.0}},
    "decoder": {"model": "Identity", "config": {"dummy": -1}},
    "predictor": {"model": "Stateless", "config": {
        "num_symbols": VOCAB, "output_dim": 32,
        "symbol_embedding_dim": 32, "context_size": 2}},
    "joiner": {"input_dim": 32, "output_dim": VOCAB, "prune_range": 3,
               "use_out_project": False},
    "loss": {"model": "Pruned_Rnnt", "config": {}},
}


@pytest.fixture(scope="module")
def task_and_params():
    from speech2text_tpu.tasks import TaskFactory
    task = TaskFactory("Pruned_Rnnt")(CFG)
    params = task.init(jax.random.PRNGKey(0))
    return task, params


@pytest.fixture(scope="module")
def onnx_dir(task_and_params, tmp_path_factory):
    from speech2text_tpu.export import export_onnx_modules
    task, params = task_and_params
    d = tmp_path_factory.mktemp("onnx")
    paths = export_onnx_modules(task, params, str(d), max_frames=64,
                                int8=True)
    return paths


def test_onnx_trio_artifacts(onnx_dir):
    """The reference's deployment artifact set exists (reference
    rnnt_task.py:764-806: units.txt, encoder/predictor/joiner .onnx
    + *_int8.onnx)."""
    for key in ("encoder", "predictor", "joiner", "encoder_stream",
                "encoder_int8", "predictor_int8", "joiner_int8",
                "encoder_stream_int8", "units", "encoder_stream_spec"):
        assert key in onnx_dir, f"missing artifact {key}"
        assert os.path.getsize(onnx_dir[key]) > 0
    units = open(onnx_dir["units"]).read().splitlines()
    assert len(units) == VOCAB


def test_onnx_sherpa_metadata_props(onnx_dir):
    """Decode-critical metadata is embedded IN the exported ModelProto's
    metadata_props — the sherpa-onnx load-time contract (reference
    zipformer.py:762-776,887-898, stateless_predictor.py:218-222,
    joiner.py:293-295) — parsed back from the serialized bytes, not from
    any sidecar. The int8 variants must carry the same props."""
    from speech2text_tpu.onnx import proto

    def meta(key):
        with open(onnx_dir[key], "rb") as f:
            return proto.parse_model(f.read()).metadata

    ms = meta("encoder_stream")
    assert ms["model_type"] == "zipformer2"
    assert ms["version"] == "1"
    assert ms["decode_chunk_len"] == "16"       # 2 × chunk_size 8
    assert ms["T"] == "16"
    assert ms["num_encoder_layers"] == "1,1"
    assert ms["encoder_dims"] == "32,32"
    assert ms["cnn_module_kernels"] == "7,7"
    # left 4 chunks × 8 frames = 32, divided by per-stack ds (1, 2)
    assert ms["left_context_len"] == "32,16"
    assert ms["query_head_dims"] == "8,8"
    assert ms["value_head_dims"] == "8,8"
    assert ms["num_heads"] == "2,2"

    me = meta("encoder")
    assert me["model_type"] == "zipformer2"
    assert me["comment"] == "non-streaming zipformer2"

    mp = meta("predictor")
    assert mp["context_size"] == "2"
    assert mp["vocab_size"] == str(VOCAB)

    assert meta("joiner")["joiner_dim"] == "32"

    # dynamic-int8 rewrite preserves the metadata contract
    mq = meta("encoder_stream_int8")
    assert mq["model_type"] == "zipformer2"
    assert mq["decode_chunk_len"] == "16"
    assert meta("predictor_int8")["vocab_size"] == str(VOCAB)


def test_onnx_encoder_parity(task_and_params, onnx_dir):
    from speech2text_tpu.tasks.rnnt import RnntModel
    task, params = task_and_params
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 80)), jnp.float32)
    lens = jnp.asarray([64], jnp.int32)
    with jax.default_matmul_precision("highest"):
        live_out, live_lens = task.model.apply(
            {"params": params}, feats, lens, method=RnntModel.encode)
    data = open(onnx_dir["encoder"], "rb").read()
    got_out, got_lens = _run(data, feats, lens)
    np.testing.assert_array_equal(got_lens.astype(np.int32),
                                  np.asarray(live_lens))
    np.testing.assert_allclose(got_out, np.asarray(live_out),
                               rtol=2e-4, atol=2e-4)


def test_onnx_predictor_joiner_parity(task_and_params, onnx_dir):
    from speech2text_tpu.tasks.rnnt import RnntModel
    task, params = task_and_params
    state = task.model.predictor.init_state(1)
    tok = jnp.asarray([3], jnp.int32)
    with jax.default_matmul_precision("highest"):
        live_p, live_s = task.model.apply(
            {"params": params}, tok, state, method=RnntModel.predictor_step)
    data = open(onnx_dir["predictor"], "rb").read()
    got = _run(data, tok, *jax.tree_util.tree_leaves(state))
    live_flat = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves((live_p, live_s))]
    assert len(got) == len(live_flat)
    for g, w in zip(got, live_flat):
        if np.issubdtype(w.dtype, np.integer):
            np.testing.assert_array_equal(g.astype(w.dtype), w)
        else:
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)

    d = CFG["joiner"]["input_dim"]
    rng = np.random.default_rng(1)
    enc_f = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
    # deployment contract: the joiner graph takes (1, D) frames — the
    # host squeezes the predictor's singleton time dim (as the decode
    # loops here and in sherpa do)
    pred_f = jnp.reshape(live_p, (1, d))
    with jax.default_matmul_precision("highest"):
        live_j = task.model.apply({"params": params}, enc_f, pred_f,
                                  method=RnntModel.joiner_step)
    got_j = _run(open(onnx_dir["joiner"], "rb").read(),
                 enc_f, np.asarray(pred_f))
    np.testing.assert_allclose(
        got_j[0], np.asarray(jax.tree_util.tree_leaves(live_j)[0]),
        rtol=1e-5, atol=1e-5)


def test_onnx_streaming_encoder_parity(task_and_params, onnx_dir):
    """Drive the exported streaming graph for 3 chunks purely through the
    spec sidecar (state names/shapes), as a deployment host would, and
    match the live streaming_step outputs chunk by chunk."""
    import json
    from speech2text_tpu.models.zipformer import Zipformer2
    task, params = task_and_params
    enc = task.model.encoder
    spec = json.load(open(onnx_dir["encoder_stream_spec"]))
    chunk = spec["chunk_size"]

    live_state = enc.apply({"params": params["encoder"]}, 1, chunk,
                           spec["left_context_chunks"],
                           method=Zipformer2.init_streaming_state)
    onnx_state = [np.zeros(s["shape"], np.dtype(s["dtype"].replace(
        "bfloat16", "float32"))) for s in spec["state"]]
    # live init state leaves (minus static chunk_size) == spec layout
    live_state.pop("chunk_size")
    live_leaves = jax.tree_util.tree_leaves(live_state)
    assert len(live_leaves) == len(onnx_state)
    for l, o in zip(live_leaves, onnx_state):
        assert tuple(l.shape) == tuple(o.shape)
        o[...] = np.asarray(l, o.dtype)

    runner = OnnxRunner(open(onnx_dir["encoder_stream"], "rb").read())
    treedef = jax.tree_util.tree_structure(live_state)
    rng = np.random.default_rng(7)
    st = dict(live_state)
    for i in range(3):
        feats = rng.standard_normal(
            (1, spec["feats_per_step"], 80)).astype(np.float32) * 0.3
        st["chunk_size"] = chunk
        with jax.default_matmul_precision("highest"):
            live_out, st = enc.apply({"params": params["encoder"]},
                                     jnp.asarray(feats), st,
                                     method=Zipformer2.streaming_step)
        st.pop("chunk_size")
        outs = runner(feats, *onnx_state)
        got_out, onnx_state = outs[0], list(outs[1:])
        np.testing.assert_allclose(got_out, np.asarray(live_out),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"chunk {i}")


def test_onnx_export_with_flash_attn_enabled(tmp_path):
    """A flagship-style config with use_flash_attn=true still exports:
    pallas_call has no ONNX lowering, so the exporter swaps in the
    materialized-attention graph (same function — tests/test_flash_attn.py
    proves fwd equality)."""
    import copy

    from speech2text_tpu.export import export_onnx_modules
    from speech2text_tpu.tasks import TaskFactory
    cfg = copy.deepcopy(CFG)
    cfg["encoder"]["config"]["use_flash_attn"] = True
    task = TaskFactory("Pruned_Rnnt")(cfg)
    params = task.init(jax.random.PRNGKey(0))
    paths = export_onnx_modules(task, params, str(tmp_path),
                                max_frames=32, int8=False)
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 80)), jnp.float32)
    lens = jnp.asarray([32], jnp.int32)
    from speech2text_tpu.tasks.rnnt import RnntModel
    with jax.default_matmul_precision("highest"):
        live_out, _ = task.model.apply({"params": params}, feats, lens,
                                       method=RnntModel.encode)
    got = _run(open(paths["encoder"], "rb").read(), feats, lens)
    np.testing.assert_allclose(got[0], np.asarray(live_out),
                               rtol=2e-4, atol=2e-4)


def test_onnx_int8_predictor_error_bound(task_and_params, onnx_dir):
    """int8 predictor output stays within dynamic-quant error of fp32
    (same check the reference's sherpa deployment relies on)."""
    task, params = task_and_params
    state = task.model.predictor.init_state(1)
    tok = jnp.asarray([7], jnp.int32)
    fp = _run(open(onnx_dir["predictor"], "rb").read(),
              tok, *jax.tree_util.tree_leaves(state))
    q = _run(open(onnx_dir["predictor_int8"], "rb").read(),
             tok, *jax.tree_util.tree_leaves(state))
    ref_mag = max(np.abs(fp[0]).max(), 1e-3)
    assert np.abs(q[0] - fp[0]).max() < 0.05 * ref_mag
    assert os.path.getsize(onnx_dir["predictor_int8"]) < \
        0.65 * os.path.getsize(onnx_dir["predictor"])
