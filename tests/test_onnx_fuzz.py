"""Randomized differential fuzz over the twin ONNX executors.

The numpy oracle (``models/onnx_exec``) and the jitted compiler
(``models/onnx_jax``) are hand-kept twins — every op has two
implementations. The targeted gates pin each op against torch on specific
shapes; this fuzzer composes random DAGs from the shared op set on random
shapes and requires the two executors to agree, catching the divergence
class the targeted tests can't reach (broadcast corners, dtype promotion,
negative-axis handling, attribute defaults applied on one side only).

Seeded RNG — failures reproduce by seed; each case prints its seed on
mismatch via the assert message.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.onnx_exec import run_graph
from realtime_analytics_tpu.models.onnx_jax import compile_graph
from realtime_analytics_tpu.models.onnx_lite import OnnxGraph, OnnxNode

# Each entry: (op_type, build_fn(rng, shape) -> (node_attrs, extra_inits))
# applied to a single [N, C, H, W] tensor value; unary ops keep the shape,
# so any sequence composes. Binary ops pair the value with a broadcastable
# random initializer.


def _unary_ops(rng, shape):
    r = len(shape)
    axis = int(rng.integers(-r, r))
    ops = [
        ("Relu", {}, {}),
        ("LeakyRelu", {"alpha": float(rng.uniform(0.01, 0.3))}, {}),
        ("Sigmoid", {}, {}),
        ("Tanh", {}, {}),
        ("Exp", {}, {}),
        ("Sqrt", {}, {}),  # fed |x| via Abs below when chosen
        ("Neg", {}, {}),
        ("Abs", {}, {}),
        ("Floor", {}, {}),
        ("Ceil", {}, {}),
        ("Round", {}, {}),
        ("Sign", {}, {}),
        ("Softplus", {}, {}),
        ("Mish", {}, {}),
        ("HardSigmoid", {"alpha": float(rng.uniform(0.1, 0.3)),
                         "beta": float(rng.uniform(0.3, 0.7))}, {}),
        ("HardSwish", {}, {}),
        ("Elu", {"alpha": float(rng.uniform(0.5, 2.0))}, {}),
        ("Gelu", {"approximate":
                  "tanh" if rng.integers(2) else "none"}, {}),
        ("Softmax", {"axis": axis}, {}),
        ("LogSoftmax", {"axis": axis}, {}),
        ("Selu", {}, {}),
        ("Celu", {"alpha": float(rng.uniform(0.5, 2.0))}, {}),
        ("Erf", {}, {}),
        ("Identity", {}, {}),
    ]
    return ops[int(rng.integers(len(ops)))]


def _binary_ops(rng, shape):
    # broadcastable partner: full shape, a keepdim-1 variant, or scalar
    keep1 = tuple(1 if rng.integers(2) else s for s in shape)
    bshape = [shape, keep1, ()][int(rng.integers(3))]
    b = rng.standard_normal(bshape).astype(np.float32) * 0.5 + 1.5
    op = ["Add", "Sub", "Mul", "Div", "Max", "Min", "PRelu"][
        int(rng.integers(7))
    ]
    return op, {}, {"b": np.abs(b) + 0.5 if op == "Div" else b}


def _shape_ops(rng, shape):
    n, c, h, w = shape
    choices = []
    perm = list(rng.permutation(4))
    choices.append(("Transpose", {"perm": perm}, {},
                    tuple(np.array(shape)[perm])))
    choices.append(("Flatten", {"axis": 2}, {}, (n * c, h * w)))
    if h > 2 and w > 2:
        choices.append((
            "Slice", {},
            {"starts": np.array([1, 0], np.int64),
             "ends": np.array([h - 1, w - 1], np.int64),
             "axes": np.array([2, 3], np.int64)},
            (n, c, h - 2, w - 1),
        ))
    if c % 2 == 0:
        choices.append(("Reshape", {},
                        {"tgt": np.array([n, c // 2, 2 * h, w], np.int64)},
                        (n, c // 2, 2 * h, w)))
    pads = [int(p) for p in rng.integers(0, 3, 8)]
    mode = ["constant", "reflect", "edge", "wrap"][int(rng.integers(4))]
    if mode != "constant":
        # reflect/edge/wrap need pad < dim; clamp
        pads = [min(p, 1) for p in pads]
    out = (n + pads[0] + pads[4], c + pads[1] + pads[5],
           h + pads[2] + pads[6], w + pads[3] + pads[7])
    choices.append(("Pad", {"mode": mode},
                    {"pads": np.array(pads, np.int64)}, out))
    return choices[int(rng.integers(len(choices)))]


def _reduce_ops(rng, shape):
    axis = int(rng.integers(0, 4))
    op = ["ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
          "ReduceProd", "ReduceL2"][int(rng.integers(6))]
    return op, {"axes": [axis], "keepdims": 1}, {}


def _build_case(seed):
    """Random chain: input [N,C,H,W] -> 3-6 random nodes -> output.
    Returns (graph, feed). Only shape-preserving and shape-tracked ops, so
    composition is always valid."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3))
    c = int(rng.integers(1, 5)) * 2
    h = int(rng.integers(3, 9))
    w = int(rng.integers(3, 9))
    shape = (n, c, h, w)
    x = rng.standard_normal(shape).astype(np.float32)

    nodes, inits = [], {}
    cur, cur_shape = "x", shape
    depth = int(rng.integers(3, 7))
    for i in range(depth):
        kind = int(rng.integers(4))
        out = f"v{i}"
        if kind == 0:
            op, attrs, extra = _unary_ops(rng, cur_shape)
            if op in ("Sqrt", "Log"):  # keep domain valid
                nodes.append(OnnxNode("Abs", inputs=[cur],
                                      outputs=[f"abs{i}"]))
                cur = f"abs{i}"
            nodes.append(OnnxNode(op, inputs=[cur], outputs=[out],
                                  attrs=attrs))
        elif kind == 1:
            op, attrs, extra = _binary_ops(rng, cur_shape)
            name = f"b{i}"
            inits[name] = extra["b"]
            nodes.append(OnnxNode(op, inputs=[cur, name],
                                  outputs=[out], attrs=attrs))
        elif kind == 2 and len(cur_shape) == 4:
            op, attrs, extra, new_shape = _shape_ops(rng, cur_shape)
            named = {}
            for k, v in extra.items():
                named[f"{k}{i}"] = v
            inits.update(named)
            nodes.append(OnnxNode(op, inputs=[cur] + list(named),
                                  outputs=[out], attrs=attrs))
            cur_shape = new_shape
        elif kind == 3 and len(cur_shape) == 4:
            op, attrs, extra = _reduce_ops(rng, cur_shape)
            attrs = dict(attrs)
            ax = attrs["axes"][0]
            nodes.append(OnnxNode(op, inputs=[cur], outputs=[out],
                                  attrs=attrs))
            s = list(cur_shape)
            s[ax] = 1
            cur_shape = tuple(s)
        else:
            nodes.append(OnnxNode("Relu", inputs=[cur], outputs=[out]))
        cur = out
    # bounded magnitude for comparison stability
    nodes.append(OnnxNode("Tanh", inputs=[cur], outputs=["y"]))
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=["x"], outputs=["y"])
    return g, {"x": x}


@pytest.mark.parametrize("seed", range(0, 40))
def test_fuzz_twin_executors_agree(seed):
    g, feed = _build_case(seed)
    try:
        (want,) = run_graph(g, feed)
    except FloatingPointError:
        pytest.skip("degenerate numerics for this seed")
    fn = compile_graph(g)
    (got,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(feed["x"]))
    np.testing.assert_allclose(
        np.asarray(got), want, atol=1e-4, rtol=1e-3,
        err_msg=f"twin executors diverge on fuzz seed {seed}: "
                f"ops={[n.op_type for n in g.nodes]}",
    )


# ---------------------------------------------------------------------------
# heavy-op fuzz: random conv/pool/norm/resize stacks with tracked shapes


def _heavy_layer(rng, shape, i):
    """Pick a random heavy op valid for ``shape``; returns
    (node, extra_inits, out_shape)."""
    n, c, h, w = shape
    choices = ["conv", "convT", "pool", "bn", "inorm", "resize"]
    if c % 2 == 0:
        choices.append("gnorm")
    kind = choices[int(rng.integers(len(choices)))]
    if kind == "conv":
        m = int(rng.integers(2, 7))
        k = int(rng.integers(1, min(4, h, w) + 1))
        s = int(rng.integers(1, 3))
        p = int(rng.integers(0, 2))
        groups = c if (rng.integers(4) == 0 and m % c == 0) else 1
        wgt = rng.standard_normal(
            (m, c // groups, k, k)).astype(np.float32) * 0.3
        b = rng.standard_normal(m).astype(np.float32) * 0.1
        oh = (h + 2 * p - k) // s + 1
        ow = (w + 2 * p - k) // s + 1
        if oh < 1 or ow < 1:
            return None
        node = OnnxNode("Conv", inputs=[f"in{i}", f"w{i}", f"bias{i}"],
                        outputs=[f"out{i}"],
                        attrs={"strides": [s, s], "pads": [p, p, p, p],
                               "group": groups})
        return node, {f"w{i}": wgt, f"bias{i}": b}, (n, m, oh, ow)
    if kind == "convT":
        m = int(rng.integers(2, 6))
        k = int(rng.integers(2, 4))
        s = int(rng.integers(1, 3))
        p = int(rng.integers(0, k))  # conv-transpose pad must be < k_eff
        op_ = int(rng.integers(0, s))
        wgt = rng.standard_normal((c, m, k, k)).astype(np.float32) * 0.3
        oh = (h - 1) * s - 2 * p + k + op_
        ow = (w - 1) * s - 2 * p + k + op_
        if oh < 1 or ow < 1 or k - 1 - p < 0:
            return None
        node = OnnxNode("ConvTranspose", inputs=[f"in{i}", f"w{i}"],
                        outputs=[f"out{i}"],
                        attrs={"strides": [s, s], "pads": [p, p, p, p],
                               "output_padding": [op_, op_]})
        return node, {f"w{i}": wgt}, (n, m, oh, ow)
    if kind == "pool":
        if min(h, w) < 2:
            return None
        k = int(rng.integers(2, min(4, h, w) + 1))
        s = int(rng.integers(1, 3))
        op = "MaxPool" if rng.integers(2) else "AveragePool"
        attrs = {"kernel_shape": [k, k], "strides": [s, s]}
        ek = k
        if op == "AveragePool":
            attrs["count_include_pad"] = 1
        elif rng.integers(2):  # MaxPool dilations (round-4 review fix)
            d = int(rng.integers(1, 3))
            ek = (k - 1) * d + 1
            if ek > min(h, w):
                return None
            attrs["dilations"] = [d, d]
        oh = (h - ek) // s + 1
        ow = (w - ek) // s + 1
        if oh < 1 or ow < 1:
            return None
        node = OnnxNode(op, inputs=[f"in{i}"], outputs=[f"out{i}"],
                        attrs=attrs)
        return node, {}, (n, c, oh, ow)
    if kind == "bn":
        extras = {
            f"scale{i}": rng.uniform(0.5, 1.5, c).astype(np.float32),
            f"bias{i}": rng.uniform(-0.3, 0.3, c).astype(np.float32),
            f"mean{i}": rng.uniform(-0.3, 0.3, c).astype(np.float32),
            f"var{i}": rng.uniform(0.5, 1.5, c).astype(np.float32),
        }
        node = OnnxNode(
            "BatchNormalization",
            inputs=[f"in{i}", f"scale{i}", f"bias{i}", f"mean{i}",
                    f"var{i}"],
            outputs=[f"out{i}"], attrs={"epsilon": 1e-5},
        )
        return node, extras, shape
    if kind == "inorm":
        extras = {
            f"scale{i}": rng.uniform(0.5, 1.5, c).astype(np.float32),
            f"bias{i}": rng.uniform(-0.3, 0.3, c).astype(np.float32),
        }
        node = OnnxNode(
            "InstanceNormalization",
            inputs=[f"in{i}", f"scale{i}", f"bias{i}"],
            outputs=[f"out{i}"], attrs={"epsilon": 1e-5},
        )
        return node, extras, shape
    if kind == "gnorm":
        extras = {
            f"scale{i}": rng.uniform(0.5, 1.5, c).astype(np.float32),
            f"bias{i}": rng.uniform(-0.3, 0.3, c).astype(np.float32),
        }
        node = OnnxNode(
            "GroupNormalization",
            inputs=[f"in{i}", f"scale{i}", f"bias{i}"],
            outputs=[f"out{i}"],
            attrs={"epsilon": 1e-5, "num_groups": 2},
        )
        return node, extras, shape
    # resize
    mode = "linear" if rng.integers(2) else "nearest"
    sc = float(rng.choice([0.5, 2.0]))
    oh, ow = int(np.floor(h * sc)), int(np.floor(w * sc))
    if oh < 1 or ow < 1:
        return None
    node = OnnxNode(
        "Resize", inputs=[f"in{i}", "", f"sc{i}"], outputs=[f"out{i}"],
        attrs={"mode": mode,
               "coordinate_transformation_mode":
               "half_pixel" if mode == "linear" else "asymmetric",
               "nearest_mode": "floor"},
    )
    return node, {f"sc{i}": np.array([1, 1, sc, sc], np.float32)}, \
        (n, c, oh, ow)


@pytest.mark.parametrize("seed", range(100, 125))
def test_fuzz_heavy_op_stacks_agree(seed):
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(1, 3)), int(rng.integers(1, 3)) * 2,
             int(rng.integers(6, 13)), int(rng.integers(6, 13)))
    x = rng.standard_normal(shape).astype(np.float32)
    nodes, inits = [], {}
    cur_shape = shape
    made = 0
    for i in range(4):
        got = _heavy_layer(rng, cur_shape, i)
        if got is None:
            continue
        node, extras, cur_shape = got
        node.inputs[0] = "x" if made == 0 else f"out{made - 1}"
        # rename output to a dense chain
        node.outputs[0] = f"out{made}"
        # remap the declared extras (they used index i; keep names)
        nodes.append(node)
        inits.update(extras)
        made += 1
    if made == 0:
        pytest.skip("no valid layer drawn for this seed")
    nodes.append(OnnxNode("Tanh", inputs=[f"out{made - 1}"],
                          outputs=["y"]))
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=["x"], outputs=["y"])
    (want,) = run_graph(g, {"x": x})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want, atol=2e-4, rtol=1e-3,
        err_msg=f"heavy fuzz seed {seed}: "
                f"ops={[n.op_type for n in g.nodes]}",
    )


# ---------------------------------------------------------------------------
# quantization fuzz: random conv stacks -> quantize_graph (random format) ->
# twin-executor parity on the QUANTIZED graph + writer round-trip + a PTQ
# accuracy bound vs the float graph


def _random_convnet(rng):
    """Random Conv(+Relu)/MaxPool stack ending in Flatten+Gemm — every
    shape tracked so the net is always valid."""
    n = int(rng.integers(1, 3))
    c = int(rng.integers(2, 5))
    h = w = int(rng.integers(8, 15))
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    nodes, inits = [], {}
    cur, cur_c, cur_hw = "x", c, (h, w)
    li = 0
    for _ in range(int(rng.integers(2, 5))):
        hh, ww = cur_hw
        if rng.integers(4) == 0 and min(hh, ww) >= 4:
            k = 2
            nodes.append(OnnxNode(
                "MaxPool", inputs=[cur], outputs=[f"p{li}"],
                attrs={"kernel_shape": [k, k], "strides": [k, k]}))
            cur, cur_hw = f"p{li}", (hh // k, ww // k)
        else:
            m = int(rng.integers(2, 7))
            k = int(rng.integers(1, min(3, hh, ww) + 1))
            s = int(rng.integers(1, 3))
            p = int(rng.integers(0, 2))
            groups = cur_c if (rng.integers(4) == 0
                               and m % cur_c == 0) else 1
            oh = (hh + 2 * p - k) // s + 1
            ow = (ww + 2 * p - k) // s + 1
            if oh < 1 or ow < 1:
                continue
            inits[f"w{li}"] = rng.standard_normal(
                (m, cur_c // groups, k, k)).astype(np.float32) * 0.4
            inits[f"cb{li}"] = rng.standard_normal(m).astype(
                np.float32) * 0.1
            nodes.append(OnnxNode(
                "Conv", inputs=[cur, f"w{li}", f"cb{li}"],
                outputs=[f"c{li}"],
                attrs={"strides": [s, s], "pads": [p, p, p, p],
                       "group": groups}))
            cur, cur_c, cur_hw = f"c{li}", m, (oh, ow)
            if rng.integers(3):
                nodes.append(OnnxNode("Relu", inputs=[cur],
                                      outputs=[f"r{li}"]))
                cur = f"r{li}"
        li += 1
    feat = cur_c * cur_hw[0] * cur_hw[1]
    nodes.append(OnnxNode("Flatten", inputs=[cur], outputs=["flat"],
                          attrs={"axis": 1}))
    out_f = int(rng.integers(3, 9))
    inits["gw"] = rng.standard_normal((out_f, feat)).astype(
        np.float32) * (1.0 / np.sqrt(feat))
    inits["gb"] = rng.standard_normal(out_f).astype(np.float32) * 0.1
    nodes.append(OnnxNode(
        "Gemm", inputs=["flat", "gw", "gb"], outputs=["y"],
        attrs={"transB": 1}))
    g = OnnxGraph(nodes=nodes, initializers=inits,
                  inputs=["x"], outputs=["y"])
    return g, x


@pytest.mark.parametrize("seed", range(200, 215))
def test_fuzz_quantized_graphs(seed):
    from realtime_analytics_tpu.models.onnx_lite import (
        read_onnx_model, write_onnx_model)
    from realtime_analytics_tpu.models.quantize import quantize_graph

    rng = np.random.default_rng(seed)
    g, x = _random_convnet(rng)
    fmt = "qoperator" if rng.integers(2) else "qdq"
    feeds = [
        {"x": rng.standard_normal(x.shape).astype(np.float32)}
        for _ in range(3)
    ] + [{"x": x}]
    qg, rep = quantize_graph(g, feeds, fmt=fmt)
    ctx = (f"quant fuzz seed {seed} fmt {fmt}: "
           f"ops={[n.op_type for n in qg.nodes]}")
    assert rep.weights_quantized, ctx

    (want_f,) = run_graph(g, {"x": x})
    (want_q,) = run_graph(qg, {"x": x})
    # PTQ accuracy bound: quantization noise, not a rewrite bug
    rel = np.abs(want_q - want_f).max() / (np.abs(want_f).max() + 1e-9)
    assert rel < 0.25, f"{ctx}: PTQ rel err {rel}"

    # twin-executor parity on the quantized graph. Tolerance: float convs
    # inside QDQ graphs can round a Q node across a quantum boundary, so
    # allow one uint8 quantum of the widest activation scale.
    fn = compile_graph(qg)
    (got,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    scales = [float(np.asarray(v).reshape(-1).max())
              for k, v in qg.initializers.items() if k.endswith("_scale")
              and np.asarray(v).dtype == np.float32]
    quantum = max(scales) if scales else 1e-3
    np.testing.assert_allclose(
        np.asarray(got), want_q, atol=max(2 * quantum, 1e-4), rtol=1e-3,
        err_msg=ctx)

    # writer round-trip is exact
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as td:
        p = _os.path.join(td, "q.onnx")
        write_onnx_model(p, qg)
        g2 = read_onnx_model(p)
        (got2,) = run_graph(g2, {"x": x})
        np.testing.assert_array_equal(want_q, got2, err_msg=ctx)


# ---------------------------------------------------------------------------
# round-5 ops (advisor ask): NonMaxSuppression / ScatterND /
# ConstantOfShape / Range twin parity. The NMS twins have different output
# contracts by design (oracle: dense [num_selected, 3]; TPU: statically
# padded [B*C*k, 3] with [-1,-1,-1] pad rows at each group tail) — parity
# is "dropping pad rows yields exactly the oracle's rows in order".


def _drop_nms_pad(rows):
    rows = np.asarray(rows)
    return rows[rows[:, 0] >= 0]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_nms_twins_agree(seed):
    rng = np.random.default_rng(1000 + seed)
    B = int(rng.integers(1, 3))
    nb = int(rng.integers(4, 24))
    C = int(rng.integers(1, 4))
    center = int(rng.integers(2))
    if center:
        # [x_c, y_c, w, h]; includes NEGATIVE w/h degenerates — the
        # area-clamp case (advisor low #3)
        boxes = np.concatenate(
            [rng.uniform(0, 10, (B, nb, 2)),
             rng.uniform(-1.5, 6, (B, nb, 2))], axis=-1
        ).astype(np.float32)
    else:
        # corner pairs in random diagonal order (spec allows flips)
        boxes = rng.uniform(0, 10, (B, nb, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (B, C, nb)).astype(np.float32)
    max_out = int(rng.integers(1, nb + 2))
    iou_thr = float(rng.uniform(0.2, 0.8))
    score_thr = None if rng.integers(2) else float(rng.uniform(0.1, 0.5))
    inits = {"mo": np.array([max_out], np.int64),
             "it": np.array([iou_thr], np.float32)}
    nms_in = ["boxes", "scores", "mo", "it"]
    if score_thr is not None:
        inits["st"] = np.array([score_thr], np.float32)
        nms_in.append("st")
    g = OnnxGraph(
        nodes=[OnnxNode("NonMaxSuppression", inputs=nms_in,
                        outputs=["sel"],
                        attrs={"center_point_box": center})],
        initializers=inits, inputs=["boxes", "scores"], outputs=["sel"],
    )
    (want,) = run_graph(g, {"boxes": boxes, "scores": scores})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda b, s: fn({"boxes": b, "scores": s}))(
        jnp.asarray(boxes), jnp.asarray(scores))
    np.testing.assert_array_equal(
        _drop_nms_pad(got), np.asarray(want),
        err_msg=f"NMS twins diverge on fuzz seed {seed} "
                f"(center={center}, max_out={max_out}, iou={iou_thr}, "
                f"score_thr={score_thr})",
    )


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_scatternd_twins_agree(seed):
    rng = np.random.default_rng(2000 + seed)
    r = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(2, 6)) for _ in range(r))
    k = int(rng.integers(1, r + 1))
    reduction = ["none", "add", "mul", "min", "max"][int(rng.integers(5))]
    # unique index tuples: XLA scatter-set with duplicate indices is
    # unspecified (the oracle defines later-update-wins; don't test UB)
    grid = np.stack(np.meshgrid(
        *[np.arange(s) for s in shape[:k]], indexing="ij"
    ), axis=-1).reshape(-1, k)
    n_upd = int(rng.integers(1, min(6, len(grid)) + 1))
    sel = rng.choice(len(grid), size=n_upd, replace=False)
    indices = grid[sel].astype(np.int64)
    data = rng.standard_normal(shape).astype(np.float32)
    updates = rng.standard_normal(
        (n_upd, *shape[k:])).astype(np.float32)
    attrs = {} if reduction == "none" else {"reduction": reduction}
    g = OnnxGraph(
        nodes=[OnnxNode("ScatterND", inputs=["data", "idx", "upd"],
                        outputs=["y"], attrs=attrs)],
        initializers={"idx": indices, "upd": updates},
        inputs=["data"], outputs=["y"],
    )
    (want,) = run_graph(g, {"data": data})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda d: fn({"data": d}))(jnp.asarray(data))
    np.testing.assert_allclose(
        np.asarray(got), want, atol=1e-5, rtol=1e-5,
        err_msg=f"ScatterND twins diverge on fuzz seed {seed} "
                f"(shape={shape}, k={k}, reduction={reduction})",
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_constantofshape_range_twins_agree(seed):
    """Range / ConstantOfShape are shape machinery: they constant-fold at
    trace time on the jitted side. Compose them with a traced tensor so
    the folded constants enter the compiled program and both executors
    must agree end to end."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(2, 5))
    m = int(rng.integers(2, 6))
    x = rng.standard_normal((n, m)).astype(np.float32)
    start = int(rng.integers(-3, 3))
    delta = int(rng.integers(1, 3))
    fill = float(rng.uniform(-2, 2))
    g = OnnxGraph(
        nodes=[
            OnnxNode("Range", inputs=["rs", "rl", "rd"], outputs=["r"]),
            OnnxNode("Cast", inputs=["r"], outputs=["rf"],
                     attrs={"to": 1}),  # 1 = FLOAT
            OnnxNode("ConstantOfShape", inputs=["shp"], outputs=["cs"],
                     attrs={"value": np.array([fill], np.float32)}),
            OnnxNode("Add", inputs=["x", "rf"], outputs=["xr"]),
            OnnxNode("Mul", inputs=["xr", "cs"], outputs=["y"]),
        ],
        initializers={
            "rs": np.array(start, np.int64),
            "rl": np.array(start + delta * m, np.int64),
            "rd": np.array(delta, np.int64),
            "shp": np.array([n, m], np.int64),
        },
        inputs=["x"], outputs=["y"],
    )
    (want,) = run_graph(g, {"x": x})
    fn = compile_graph(g)
    (got,) = jax.jit(lambda a: fn({"x": a}))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want, atol=1e-5, rtol=1e-5,
        err_msg=f"Range/ConstantOfShape twins diverge on fuzz seed {seed}",
    )
