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
