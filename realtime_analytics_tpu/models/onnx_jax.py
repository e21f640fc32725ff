"""ONNX graph -> jitted JAX function: the generic-graph serving path.

The reference's ONNX Runtime / OpenVINO backends serve *arbitrary* user
ONNX graphs (reference detector.py:484-609, temporal_detector.py:179-319):
whatever architecture the user exported, the session runs it. The named
checkpoint loaders in ``models/weights.py`` cover the documented layouts;
this module covers everything else — it compiles the ONNX **graph itself**
(parsed by ``onnx_lite.read_onnx_model``) into a jittable JAX function, so
a user ONNX file that matches no known layout still serves on TPU.

TPU-first design decisions:

* The graph compiles to XLA-level ops (``lax.conv_general_dilated``,
  ``lax.reduce_window``, ``jnp`` elementwise, ``lax.scan`` for LSTM/GRU) —
  XLA fuses and tiles them onto the MXU; no per-node Python in the hot
  path after ``jax.jit`` tracing.
* Static shapes: shape-machinery subgraphs (Shape/Gather/Slice/Concat on
  int64 shape tensors, Constant, Range, ConstantOfShape) are constant-
  folded at trace time — ``Shape`` of a traced tensor returns its static
  trace-time shape as a *concrete* numpy array, so everything downstream
  of shape math stays concrete and the jitted program has fixed shapes.
  Mixed nodes (any traced tensor input) lower to jnp/lax.
* Recurrent nodes (LSTM/GRU) become ``lax.scan`` over the time axis with
  the input-projection matmul hoisted out of the scan (one big MXU matmul
  for X @ W, only the hidden-state half recurs) — the same split-conv
  trick the native ConvGRU uses (models/temporal.py).

Semantics are pinned by construction: every op here is the jnp twin of
``onnx_exec._eval_node`` (itself diffed op-by-op against torch in
tests/test_onnx_graph_exec.py), and tests require bit-level agreement
between the two executors on full model graphs.

Usage::

    fn = compile_graph(read_onnx_model(path))   # fn: feeds dict -> [outs]
    jitted = jax.jit(lambda *a: fn(dict(zip(input_names, a))))
"""

from __future__ import annotations

import contextlib
import logging
from contextvars import ContextVar
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .onnx_exec import UnsupportedOnnxOp, _eval_node
from .onnx_lite import OnnxGraph, OnnxNode

logger = logging.getLogger(__name__)

# Active mixed-precision policy for graph tracing. None (the default)
# serves the graph in the exported dtype — fp32 end to end, the
# foreign-graph numerics contract. jnp.bfloat16 is the opt-in
# ``detector.graph_precision: bf16`` policy (≙ the reference building an
# FP16 TensorRT engine from a user's fp32 ONNX, detector.py:382-466):
#   * MXU ops (Conv/ConvTranspose/MatMul/Gemm/Einsum) take bf16 operands
#     and emit bf16 — the MXU accumulates partial sums in f32 internally
#     (the native engines' conv2d carries the measurement), ~2x the fp32
#     FLOP rate and half the HBM bytes per activation;
#   * ACCUMULATION-sensitive ops (norms, softmax, mean/sum reductions,
#     avg pools, LSTM/GRU scans, Pow) compute in fp32 islands — they
#     upcast internally via ``_f32`` / ``_acc``. Pointwise activations
#     (sigmoid/tanh/exp/gelu/...) ride bf16: bf16 keeps f32's full
#     exponent range, and an fp32 island there costs a convert pair per
#     op — measured to cancel the MXU win on conv nets;
#   * every traced float node output is downcast back to bf16 by ``_run``,
#     so elementwise chains and HBM traffic ride bf16 between islands.
_COMPUTE: ContextVar = ContextVar("onnx_graph_compute_dtype", default=None)


@contextlib.contextmanager
def graph_compute_dtype(dtype):
    """Trace-time precision policy scope; fp32 (or None) = legacy exact
    path, bf16 = the mixed policy described on ``_COMPUTE``."""
    tok = _COMPUTE.set(None if dtype in (None, jnp.float32) else
                       jnp.dtype(dtype))
    try:
        yield
    finally:
        _COMPUTE.reset(tok)


def _mxu(x):
    """Operand prep for MXU ops AND pointwise-safe activations: under the
    bf16 policy keep/cast float operands to bf16 (MXU accumulation stays
    fp32 via ``preferred_element_type``; pointwise ops like sigmoid/tanh/
    exp are range-safe in bf16 — it has f32's full exponent range — and
    upcasting them costs a convert pair per op, measured to cancel the
    MXU win); otherwise the legacy fp32 upcast."""
    cd = _COMPUTE.get()
    x = jnp.asarray(x)
    if cd is not None and jnp.issubdtype(x.dtype, jnp.floating):
        return x if x.dtype == cd else x.astype(cd)
    return _f32(x)


def _pref():
    """``preferred_element_type`` for MXU ops: under the bf16 policy the
    output IS bf16 — the MXU accumulates partial sums in f32 internally
    regardless (models/layers.py:conv2d carries the measurement: emitting
    bf16 halves every activation tensor in HBM, and forcing f32 outputs
    + converts measured SLOWER than fp32 serving, 0.82x). None = legacy
    operand-dtype default."""
    return _COMPUTE.get()


def _acc(x):
    """Accumulation-sensitive input (BatchNorm stats, ReduceMean/Sum/Prod,
    GlobalAveragePool): upcast to fp32 under the bf16 policy; identity
    otherwise (legacy dtype semantics preserved for fp32/f64 graphs)."""
    x = jnp.asarray(x)
    if _COMPUTE.get() is not None and jnp.issubdtype(x.dtype, jnp.floating):
        return _f32(x)
    return x

# ONNX TensorProto.DataType codes used by Cast
_CAST_DTYPES = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 5: jnp.int16, 6: jnp.int32,
    7: jnp.int64, 9: jnp.bool_, 10: jnp.float16, 11: jnp.float64,
    12: jnp.uint32, 13: jnp.uint64,
}


def _attr(node, name, default=None):
    return node.attrs.get(name, default)


def _is_static(v) -> bool:
    """Concrete (numpy / python scalar) vs traced (jax) value."""
    return not isinstance(v, jax.Array) and not isinstance(
        v, jax.core.Tracer
    )


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def _conv(node, x, w, b):
    k = x.ndim - 2
    if k not in (2, 3):
        raise UnsupportedOnnxOp(f"Conv over {k}D input")
    if _attr(node, "auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise UnsupportedOnnxOp("Conv auto_pad")
    strides = [int(s) for s in _attr(node, "strides", [1] * k)]
    pads = [int(p) for p in _attr(node, "pads", [0] * (2 * k))]
    dils = [int(d) for d in _attr(node, "dilations", [1] * k)]
    groups = int(_attr(node, "group", 1))
    pad_pairs = list(zip(pads[:k], pads[k:]))
    spec = ("NCHW", "OIHW", "NCHW") if k == 2 else ("NCDHW", "OIDHW", "NCDHW")
    y = lax.conv_general_dilated(
        _mxu(x), _mxu(w),
        window_strides=strides, padding=pad_pairs,
        rhs_dilation=dils, feature_group_count=groups,
        dimension_numbers=spec, preferred_element_type=_pref(),
    )
    if b is not None:
        y = y + jnp.asarray(b).astype(y.dtype).reshape((1, -1) + (1,) * k)
    return y


def _conv_transpose(node, x, w, b):
    """ONNX ``ConvTranspose`` as one ``lax.conv_general_dilated`` with
    ``lhs_dilation`` (the gradient-of-conv formulation the MXU tiles
    natively — no explicit zero-stuffed intermediate): kernel spatially
    flipped and io-transposed per group, padding (k_eff - 1 - pad) per
    side plus output_padding at the end. Twin of
    onnx_exec._conv_transpose_nd."""
    k = x.ndim - 2
    if k not in (2, 3):
        raise UnsupportedOnnxOp(f"ConvTranspose over {k}D input")
    if _attr(node, "auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise UnsupportedOnnxOp("ConvTranspose auto_pad")
    if _attr(node, "output_shape") is not None:
        raise UnsupportedOnnxOp("ConvTranspose output_shape")
    strides = [int(s) for s in _attr(node, "strides", [1] * k)]
    pads = [int(p) for p in _attr(node, "pads", [0] * (2 * k))]
    out_pad = [int(p) for p in _attr(node, "output_padding", [0] * k)]
    dils = [int(d) for d in _attr(node, "dilations", [1] * k)]
    groups = int(_attr(node, "group", 1))
    w = jnp.asarray(w)  # may be a traced param (graph-backed serving)
    c_in, m_per_g = w.shape[0], w.shape[1]
    ks = tuple(w.shape[2:])
    cg = c_in // groups
    wf = jnp.flip(w, axis=tuple(range(2, 2 + k)))
    wf = wf.reshape((groups, cg, m_per_g) + ks)
    wf = jnp.transpose(wf, (0, 2, 1) + tuple(range(3, 3 + k)))
    wf = wf.reshape((groups * m_per_g, cg) + ks)
    k_eff = [(ki - 1) * d + 1 for ki, d in zip(ks, dils)]
    pad_pairs = [
        (ke - 1 - pb, ke - 1 - pe + op_)
        for ke, pb, pe, op_ in zip(k_eff, pads[:k], pads[k:], out_pad)
    ]
    if any(p < 0 for pair in pad_pairs for p in pair):
        raise UnsupportedOnnxOp("ConvTranspose pads exceed kernel extent")
    spec = ("NCHW", "OIHW", "NCHW") if k == 2 else ("NCDHW", "OIDHW", "NCDHW")
    y = lax.conv_general_dilated(
        _mxu(x), _mxu(wf),
        window_strides=[1] * k, padding=pad_pairs,
        lhs_dilation=strides, rhs_dilation=dils,
        feature_group_count=groups, dimension_numbers=spec,
        preferred_element_type=_pref(),
    )
    if b is not None:
        y = y + jnp.asarray(b).astype(y.dtype).reshape((1, -1) + (1,) * k)
    return y


def _pool(node, x, op):
    kernel = [int(v) for v in _attr(node, "kernel_shape")]
    k = len(kernel)
    if _attr(node, "auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise UnsupportedOnnxOp(f"{node.op_type} auto_pad")
    strides = [int(s) for s in _attr(node, "strides", [1] * k)]
    pads = [int(p) for p in _attr(node, "pads", [0] * (2 * k))]
    dils = [int(d) for d in _attr(node, "dilations", [1] * k)]
    if op == "avg" and any(d != 1 for d in dils):
        raise UnsupportedOnnxOp("AveragePool dilations")
    ceil_mode = int(_attr(node, "ceil_mode", 0))
    if op == "avg" and int(_attr(node, "count_include_pad", 0)) == 0 and any(
        pads
    ):
        raise UnsupportedOnnxOp("AveragePool count_include_pad=0 w/ pads")
    # effective window extent under dilation — all output-size / ceil-mode
    # math uses it (ONNX: out = floor((in + pads - ((k-1)*d+1)) / s) + 1)
    ek = [(kernel[i] - 1) * dils[i] + 1 for i in range(k)]
    in_sp = x.shape[2:]
    begins, ends = list(pads[:k]), list(pads[k:])
    ext = [0] * k
    out_keep = None
    if ceil_mode:
        for i in range(k):
            span = in_sp[i] + begins[i] + ends[i]
            if (span - ek[i]) % strides[i]:
                ext[i] = -(span - ek[i]) % strides[i]
        # ONNX/torch drop rule: ceil-extended windows must START inside
        # in + pad_begin (onnx_exec._poolnd carries the derivation)
        out_keep = tuple(
            sum(1 for j in range(
                (in_sp[d] + begins[d] + ends[d] + ext[d] - ek[d])
                // strides[d] + 1
            ) if j * strides[d] < in_sp[d] + begins[d])
            for d in range(k)
        )
    fill = -jnp.inf if op == "max" else 0.0
    pad_cfg = [(0, 0), (0, 0)] + [
        (b_, e_ + x_) for b_, e_, x_ in zip(begins, ends, ext)
    ]
    # max pool is order-insensitive — it rides the policy dtype; avg pool
    # accumulates, so it stays an fp32 island under the bf16 policy
    xf = _mxu(x) if op == "max" else _f32(x)
    if any(p != (0, 0) for p in pad_cfg):
        xf = jnp.pad(xf, pad_cfg, constant_values=fill)
    dims = (1, 1) + tuple(kernel)
    strd = (1, 1) + tuple(strides)
    wdil = (1, 1) + tuple(dils)
    if op == "max":
        y = lax.reduce_window(xf, -jnp.inf, lax.max, dims, strd, "VALID",
                              window_dilation=wdil)
    else:
        y = lax.reduce_window(xf, 0.0, lax.add, dims, strd, "VALID")
        if any(ext):
            ones = jnp.ones((1, 1) + tuple(
                xf.shape[2 + d] - ext[d] for d in range(k)
            ), xf.dtype)
            ones = jnp.pad(
                ones, [(0, 0), (0, 0)] + [(0, e) for e in ext]
            )
            cnt = lax.reduce_window(
                ones, 0.0, lax.add, dims, strd, "VALID"
            )
            y = y / cnt
        else:
            y = y / float(np.prod(kernel))
    if out_keep is not None:
        y = y[(slice(None),) * 2 + tuple(slice(0, o) for o in out_keep)]
    return y


def _resize(node, x, scales, sizes):
    mode = _attr(node, "mode", "nearest")
    coord = _attr(node, "coordinate_transformation_mode", "half_pixel")
    nearest_mode = _attr(node, "nearest_mode", "round_prefer_floor")
    if x.ndim != 4:
        raise UnsupportedOnnxOp(
            f"Resize over {x.ndim - 2} spatial dims (only 2-D supported)"
        )
    n, c, h, w = x.shape
    if sizes is not None and np.size(sizes):
        oh, ow = int(sizes[-2]), int(sizes[-1])
        sc_h, sc_w = oh / h, ow / w
    else:
        sc_h, sc_w = float(scales[-2]), float(scales[-1])
        oh, ow = int(np.floor(h * sc_h)), int(np.floor(w * sc_w))

    def src_coord(i, scale, in_len, out_len):
        if coord == "asymmetric":
            return i / scale
        if coord in ("pytorch_half_pixel", "half_pixel"):
            xs = (i + 0.5) / scale - 0.5
            if coord == "pytorch_half_pixel" and out_len <= 1:
                return np.zeros_like(xs)
            return xs
        if coord == "align_corners":
            if out_len == 1:
                return np.zeros_like(i)
            return i * (in_len - 1) / (out_len - 1)
        raise UnsupportedOnnxOp(f"Resize coord mode '{coord}'")

    # index math is static — precompute with numpy, gather with jnp
    ys = src_coord(np.arange(oh, dtype=np.float64), sc_h, h, oh)
    xs = src_coord(np.arange(ow, dtype=np.float64), sc_w, w, ow)
    if mode == "nearest":
        if nearest_mode == "floor":
            yi, xi = np.floor(ys), np.floor(xs)
        elif nearest_mode == "ceil":
            yi, xi = np.ceil(ys), np.ceil(xs)
        elif nearest_mode == "round_prefer_ceil":
            yi, xi = np.floor(ys + 0.5), np.floor(xs + 0.5)
        else:  # round_prefer_floor (default)
            yi, xi = np.ceil(ys - 0.5), np.ceil(xs - 0.5)
        yi = np.clip(yi, 0, h - 1).astype(np.int32)
        xi = np.clip(xi, 0, w - 1).astype(np.int32)
        return x[:, :, yi][:, :, :, xi]
    if mode == "linear":
        y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int32)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int32)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = jnp.asarray(np.clip(ys - y0, 0.0, 1.0), jnp.float32)
        wx = jnp.asarray(np.clip(xs - x0, 0.0, 1.0), jnp.float32)
        xf = _f32(x)
        top = xf[:, :, y0][:, :, :, x0] * (1 - wx) + \
            xf[:, :, y0][:, :, :, x1] * wx
        bot = xf[:, :, y1][:, :, :, x0] * (1 - wx) + \
            xf[:, :, y1][:, :, :, x1] * wx
        return top * (1 - wy[:, None]) + bot * wy[:, None]
    raise UnsupportedOnnxOp(f"Resize mode '{mode}'")


def _slice_op(data, starts, ends, axes, steps):
    idx = [slice(None)] * data.ndim
    if axes is None:
        axes = list(range(len(starts)))
    if steps is None:
        steps = [1] * len(starts)
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % data.ndim
        idx[ax] = slice(int(st), int(en), int(sp))
    return data[tuple(idx)]


def _rnn_scan(node, ins, kind):
    """ONNX LSTM ('iofc') / GRU ('zrh') as lax.scan over time. X projection
    is hoisted out of the scan — one batched MXU matmul; only the hidden
    recurrence scans. Mirrors onnx_exec._lstm/_gru exactly."""
    if _attr(node, "activations") is not None:
        raise UnsupportedOnnxOp(f"{kind} custom activations")
    if int(_attr(node, "layout", 0)) != 0:
        raise UnsupportedOnnxOp(f"{kind} layout=1")
    n_gates = 4 if kind == "LSTM" else 3
    x, w, r = (_f32(jnp.asarray(a)) for a in ins[:3])
    t_len, n = x.shape[0], x.shape[1]
    num_dirs, hid = r.shape[0], r.shape[2]
    b = _f32(jnp.asarray(ins[3])) if len(ins) > 3 and ins[3] is not None \
        else jnp.zeros((num_dirs, 2 * n_gates * hid), jnp.float32)
    seq_lens = ins[4] if len(ins) > 4 else None
    if seq_lens is not None and (
        not _is_static(seq_lens)
        or not np.all(np.asarray(seq_lens) == t_len)
    ):
        raise UnsupportedOnnxOp(f"{kind} per-sequence lengths")
    h0 = _f32(jnp.asarray(ins[5])) if len(ins) > 5 and ins[5] is not None \
        else jnp.zeros((num_dirs, n, hid), jnp.float32)
    if kind == "LSTM":
        if len(ins) > 7 and ins[7] is not None:
            raise UnsupportedOnnxOp("LSTM peepholes")
        c0 = _f32(jnp.asarray(ins[6])) \
            if len(ins) > 6 and ins[6] is not None \
            else jnp.zeros((num_dirs, n, hid), jnp.float32)
    lbr = int(_attr(node, "linear_before_reset", 0))

    direction = _attr(node, "direction", "forward")
    dir_plan = {"forward": [(0, False)], "reverse": [(0, True)],
                "bidirectional": [(0, False), (1, True)]}.get(direction)
    if dir_plan is None:
        raise UnsupportedOnnxOp(f"RNN direction '{direction}'")

    ys, hs, cs = [], [], []
    for slot, reverse in dir_plan:
        rT = r[slot].T  # [H, nG*H]
        if kind == "LSTM":
            wb = b[slot, : 4 * hid] + b[slot, 4 * hid :]
            gx = x @ w[slot].T + wb  # [T, N, 4H] iofc

            def cell(carry, g_t, rT=rT):
                h, c = carry
                g = g_t + h @ rT
                i = jax.nn.sigmoid(g[:, :hid])
                o = jax.nn.sigmoid(g[:, hid : 2 * hid])
                f = jax.nn.sigmoid(g[:, 2 * hid : 3 * hid])
                ct = jnp.tanh(g[:, 3 * hid :])
                c = f * c + i * ct
                h = o * jnp.tanh(c)
                return (h, c), h

            carry0 = (h0[slot], c0[slot])
        else:
            wb = b[slot, : 3 * hid]
            rb = b[slot, 3 * hid :]
            gx = x @ w[slot].T + wb  # [T, N, 3H] zrh

            def cell(carry, g_t, rT=rT, rb=rb):
                h = carry
                # lbr=1 needs all 3H recurrent columns (one fused matmul);
                # lbr=0's candidate applies R AFTER the reset gate, so the
                # scan only needs the z/r 2H columns of h @ R
                gh = h @ (rT if lbr else rT[:, : 2 * hid])
                z = jax.nn.sigmoid(
                    g_t[:, :hid] + gh[:, :hid] + rb[:hid]
                )
                rt = jax.nn.sigmoid(
                    g_t[:, hid : 2 * hid] + gh[:, hid : 2 * hid]
                    + rb[hid : 2 * hid]
                )
                if lbr:
                    hh = jnp.tanh(
                        g_t[:, 2 * hid :]
                        + rt * (gh[:, 2 * hid :] + rb[2 * hid :])
                    )
                else:
                    hh = jnp.tanh(
                        g_t[:, 2 * hid :]
                        + (rt * h) @ rT[:, 2 * hid :] + rb[2 * hid :]
                    )
                h = (1.0 - z) * hh + z * h
                return h, h

            carry0 = h0[slot]
        carry, y = lax.scan(cell, carry0, gx, reverse=reverse)
        ys.append(y)  # [T, N, H]
        if kind == "LSTM":
            hs.append(carry[0])
            cs.append(carry[1])
        else:
            hs.append(carry)
    y = jnp.stack(ys, axis=1)  # [T, D, N, H]
    y_h = jnp.stack(hs, axis=0)
    if kind == "LSTM":
        return y, y_h, jnp.stack(cs, axis=0)
    return y, y_h


def _quant_axis_j(nd, scale, zp, axis):
    """jnp twin of ``onnx_exec._qaxis``: ONNX Q/DQ scale + zero-point pair
    (scalar or 1-D per-axis) broadcast-shaped against a rank-``nd``
    tensor. Scale may be traced (float initializers ride as runtime
    params); zero points are int initializers and stay static."""
    s = jnp.asarray(scale).astype(jnp.float32)
    if s.ndim > 1:
        raise UnsupportedOnnxOp("blocked quantization (scale rank > 1)")
    z = jnp.asarray(0 if zp is None else zp).astype(jnp.int32)
    if s.ndim == 1 and s.shape[0] > 1:
        shape = [1] * nd
        shape[axis if axis >= 0 else axis + nd] = s.shape[0]
        s = s.reshape(shape)
        if z.size > 1:
            z = z.reshape(shape)
    return s, z


def _qdt(zp):
    """Quantized output dtype: the zero point's, or the uint8 default."""
    return np.dtype(zp.dtype) if zp is not None else np.dtype(np.uint8)


def _to_s8(x):
    """Canonicalize a u8/s8 tensor to s8 operands + the zero-point shift:
    uint8 values shift by -128 (exactly representable in int8), so every
    integer matmul/conv runs the MXU's native s8 x s8 -> s32 path (the
    AQT TPU pattern). Returns (s8 tensor, shift applied)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.int32) - 128).astype(jnp.int8), 128
    if x.dtype == jnp.int8:
        return x, 0
    raise UnsupportedOnnxOp(f"integer op on {x.dtype} operand")


def _zp_arr(zp, shift):
    """Zero point (scalar or 1-D, static or traced) minus the s8 shift,
    as an int32 jnp array."""
    return jnp.asarray(0 if zp is None else zp).astype(jnp.int32) - shift


def _matmul_int_j(a, b, azp, bzp):
    """``(a - a_zp) @ (b - b_zp)`` in int32 without ever widening the
    matmul operands past int8: the main product rides the MXU s8 x s8 ->
    s32 path; the zero-point cross terms are rank-reduced row/column sums
    (VPU adds), never a wide matmul. Twin of ``onnx_exec._matmul_int``.
    1-D operands follow numpy matmul semantics (promote, then squeeze),
    matching the numpy twin's output rank."""
    a8, ash = _to_s8(a)
    b8, bsh = _to_s8(b)
    a_1d, b_1d = a8.ndim == 1, b8.ndim == 1
    if a_1d:
        a8 = a8[None, :]
    if b_1d:
        b8 = b8[:, None]
    az = _zp_arr(azp, ash)  # scalar or 1-D per-row of a
    bz = _zp_arr(bzp, bsh)  # scalar or 1-D per-column of b
    if az.ndim == 1 and az.shape[0] > 1:
        az = az[:, None]
    out = jnp.matmul(a8, b8, preferred_element_type=jnp.int32)
    if not (ash == 0 and bsh == 0
            and (azp is None or (_is_static(azp)
                                 and not np.any(np.asarray(azp))))
            and (bzp is None or (_is_static(bzp)
                                 and not np.any(np.asarray(bzp))))):
        # not symmetric everywhere: add the zero-point cross terms
        k = a8.shape[-1]
        colsum_b = b8.astype(jnp.int32).sum(axis=-2)        # [..., N]
        rowsum_a = a8.astype(jnp.int32).sum(axis=-1)        # [..., M]
        out = (out - az * colsum_b[..., None, :]
               - rowsum_a[..., :, None] * bz + k * az * bz)
    if b_1d:
        out = out[..., :, 0]
    if a_1d:
        out = out[..., 0, :] if not b_1d else out[..., 0]
    return out


def _conv_int_j(node, x, w, xzp, wzp):
    """Integer ``conv(x - x_zp, w - w_zp)`` -> int32, MXU-true: operands
    stay int8 (uint8 shifts by 128), the main conv accumulates s8 x s8 ->
    s32, and the zero-point terms decompose into one ones-kernel window
    sum per group plus per-channel constants. Implicit padding pads x
    with x_zero_point per the ONNX spec — padding the SHIFTED input with
    the SHIFTED zero point is the identical computation. Twin of
    ``onnx_exec._conv_int``."""
    k = x.ndim - 2
    if k not in (2, 3):
        raise UnsupportedOnnxOp(f"{node.op_type} over {k}D input")
    if _attr(node, "auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise UnsupportedOnnxOp(f"{node.op_type} auto_pad")
    strides = [int(s) for s in _attr(node, "strides", [1] * k)]
    pads = [int(p) for p in _attr(node, "pads", [0] * (2 * k))]
    dils = [int(d) for d in _attr(node, "dilations", [1] * k)]
    groups = int(_attr(node, "group", 1))
    x8, xsh = _to_s8(x)
    w8, wsh = _to_s8(w)
    xz = _zp_arr(xzp, xsh)
    if xz.size != 1:
        raise UnsupportedOnnxOp(f"{node.op_type} per-axis x_zero_point")
    wz = _zp_arr(wzp, wsh)  # scalar or 1-D per-output-channel
    m = w8.shape[0]
    cg = w8.shape[1]
    ks = tuple(w8.shape[2:])
    taps = cg * int(np.prod(ks))
    spec = ("NCHW", "OIHW", "NCHW") if k == 2 else ("NCDHW", "OIDHW", "NCDHW")
    # explicit x_zp padding (spec), then zero implicit padding everywhere
    if any(pads):
        pad_width = ((0, 0), (0, 0)) + tuple(zip(pads[:k], pads[k:]))
        x8 = jnp.pad(x8, pad_width,
                     constant_values=xz.reshape(()).astype(jnp.int8))
    zero_pads = [(0, 0)] * k
    acc = lax.conv_general_dilated(
        x8, w8, window_strides=strides, padding=zero_pads,
        rhs_dilation=dils, feature_group_count=groups,
        dimension_numbers=spec, preferred_element_type=jnp.int32,
    )
    ch_shape = (1, m) + (1,) * k
    # zero points are int initializers -> static in practice; the skip
    # decision needs concrete values, a traced zp just computes all terms
    static_xz0 = xsh == 0 and (
        xzp is None or (_is_static(xzp) and not np.any(np.asarray(xzp))))
    static_wz0 = wsh == 0 and (
        wzp is None or (_is_static(wzp) and not np.any(np.asarray(wzp))))
    if not static_wz0:
        # - w_zp * window-sum(x) : one ones-kernel conv per group (s8 MXU)
        ones = jnp.ones((groups, cg) + ks, dtype=jnp.int8)
        s = lax.conv_general_dilated(
            x8, ones, window_strides=strides, padding=zero_pads,
            rhs_dilation=dils, feature_group_count=groups,
            dimension_numbers=spec, preferred_element_type=jnp.int32,
        )
        s = jnp.repeat(s, m // groups, axis=1)
        acc = acc - wz.reshape(ch_shape if wz.size > 1 else ()) * s
    if not static_xz0:
        # - x_zp * sum(w) per out channel (+ x_zp * w_zp * taps constant)
        wsum = w8.astype(jnp.int32).sum(
            axis=tuple(range(1, w8.ndim))).reshape(ch_shape)
        acc = acc - xz * wsum
        acc = acc + xz * wz.reshape(ch_shape if wz.size > 1 else ()) * taps
    return acc


def _nms_padded_j(node, boxes, scores, max_out, iou_thr, score_thr):
    """Static-shape twin of onnx_exec._nms_select (graph-embedded NMS of
    end-to-end detection exports, reference detector.py:484-609 executes
    these files as-is through ORT).

    ONNX NonMaxSuppression is dynamically shaped ([num_selected, 3]); a
    jitted TPU program cannot be. Contract here: output is the PADDED
    ``[B * C * max_out, 3]`` int32 row set where invalid rows are
    ``[-1, -1, -1]``; dropping pad rows yields exactly the oracle's rows
    in the oracle's (batch, class, score-desc) order — pads sit at each
    (batch, class) group's tail. ``OnnxGraphYolo`` consumes this with a
    validity mask; foreign glue that takes ``Shape`` of the NMS output
    sees the padded bound (documented in docs/models.md)."""
    boxes = _f32(jnp.asarray(boxes))
    scores = _f32(jnp.asarray(scores))
    B, nb = boxes.shape[0], boxes.shape[1]
    C = scores.shape[1]
    k = int(min(max_out, nb))
    if k <= 0:  # spec: max_output_boxes_per_class defaults to 0 = no rows
        return jnp.zeros((0, 3), jnp.int32)
    if C * k > 65536:
        # torch exports commonly set max_output_boxes_per_class to a huge
        # bound; the static-shape TPU twin then compiles a sequential
        # O(C * k * nb) scan with a [B*C*k, 3] padded output (e.g. an
        # 8400-anchor 80-class export is a multi-gigaop serial program
        # per image). Surface it rather than silently compiling forever.
        logger.warning(
            "NonMaxSuppression: classes (%d) x max_output_boxes_per_class "
            "(%d) = %d padded rows per image — the static-shape TPU "
            "lowering is a serial scan over that bound and will compile/"
            "run very slowly; re-export with a realistic "
            "max_output_boxes_per_class (e.g. 100-300)", C, k, C * k,
        )
    if int(_attr(node, "center_point_box", 0)):
        half = boxes[..., 2:] * 0.5
        corners = jnp.concatenate(
            [boxes[..., :2] - half, boxes[..., :2] + half], axis=-1
        )
    else:
        # corner pairs in either diagonal order (spec allows flips)
        lo = jnp.minimum(boxes[..., :2], boxes[..., 2:])
        hi = jnp.maximum(boxes[..., :2], boxes[..., 2:])
        corners = jnp.concatenate([lo, hi], axis=-1)
    # clamp like the oracle (_nms_corners uses max(hi-lo, 0)): degenerate
    # center_point_box=1 boxes with negative w/h must not flip IoU sign
    area = jnp.prod(
        jnp.maximum(corners[..., 2:] - corners[..., :2], 0.0), axis=-1)

    def one(cor, ar, sc):  # [nb, 4], [nb], [nb] -> [k] picks (-1 pad)
        alive = jnp.ones((nb,), bool) if score_thr is None \
            else sc > score_thr
        ninf = jnp.float32(-jnp.inf)

        def body(alive, _):
            masked = jnp.where(alive, sc, ninf)
            i = jnp.argmax(masked)  # ties -> lowest index, like the
            ok = masked[i] > ninf   # oracle's stable argsort / ORT
            lo = jnp.maximum(cor[i, :2], cor[:, :2])
            hi = jnp.minimum(cor[i, 2:], cor[:, 2:])
            inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
            union = ar[i] + ar - inter
            iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12),
                            0.0)
            alive = alive & ~(iou > iou_thr)
            alive = alive.at[i].set(False)  # zero-area self-IoU guard
            return alive, jnp.where(ok, i.astype(jnp.int32), -1)

        _, picks = lax.scan(body, alive, None, length=k)
        return picks

    picks = jax.vmap(  # batch
        lambda cor, ar, sc_bc: jax.vmap(
            lambda s: one(cor, ar, s)
        )(sc_bc)
    )(corners, area, scores)  # [B, C, k]
    valid = picks >= 0
    b_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, C, k))
    c_idx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None], (B, C, k))
    rows = jnp.stack([
        jnp.where(valid, b_idx, -1),
        jnp.where(valid, c_idx, -1),
        picks,
    ], axis=-1)
    return rows.reshape(B * C * k, 3)


def _requant_j(acc, mul, yzp, qdt):
    """jnp twin of ``onnx_exec._requant``: int32 accumulator -> quantized
    output via ``saturate(rint(acc * mul) + y_zp)`` in float32."""
    info = np.iinfo(qdt)
    yz = jnp.asarray(0 if yzp is None else yzp).astype(jnp.float32)
    y = jnp.rint(acc.astype(jnp.float32) * mul) + yz.reshape(())
    return jnp.clip(y, info.min, info.max).astype(qdt)


def _eval_node_jax(node: OnnxNode, values: Dict[str, object]) -> None:
    """jnp twin of onnx_exec._eval_node — called when any tensor input is
    traced. Shape-tensor arguments (Reshape target, Slice bounds, Resize
    sizes, ...) must be static by then; _run raises otherwise."""
    op = node.op_type
    ins = [values[i] for i in node.inputs]

    def put(*results):
        for name, r in zip(node.outputs, results):
            if name:  # "" = omitted optional output; never clobber the
                values[name] = r  # values[""]=None absent-input sentinel

    def need_static(v, what):
        if not _is_static(v):
            raise UnsupportedOnnxOp(
                f"{op}: {what} is data-dependent (traced) — the jitted "
                "graph needs static shapes"
            )
        return v

    if op == "Conv":
        put(_conv(node, ins[0], ins[1], ins[2] if len(ins) > 2 else None))
    elif op == "Gemm":
        a, b_ = _mxu(ins[0]), _mxu(ins[1])
        if int(_attr(node, "transA", 0)):
            a = a.T
        if int(_attr(node, "transB", 0)):
            b_ = b_.T
        y = float(_attr(node, "alpha", 1.0)) * jnp.matmul(
            a, b_, preferred_element_type=_pref()
        )
        if len(ins) > 2 and ins[2] is not None:
            y = y + float(_attr(node, "beta", 1.0)) * jnp.asarray(
                ins[2]
            ).astype(y.dtype)
        put(y)
    elif op == "MatMul":
        put(jnp.matmul(_mxu(ins[0]), _mxu(ins[1]),
                       preferred_element_type=_pref()))
    elif op == "BatchNormalization":
        x, scale, bias, mean, var = (_acc(v) for v in ins[:5])
        eps = float(_attr(node, "epsilon", 1e-5))
        shape = (1, -1) + (1,) * (x.ndim - 2)
        put((x - mean.reshape(shape))
            / jnp.sqrt(var.reshape(shape) + eps)
            * scale.reshape(shape) + bias.reshape(shape))
    elif op == "Relu":
        put(jnp.maximum(ins[0], 0))
    elif op == "LeakyRelu":
        alpha = float(_attr(node, "alpha", 0.01))
        put(jnp.where(ins[0] > 0, ins[0], alpha * ins[0]))
    elif op == "Sigmoid":
        put(jax.nn.sigmoid(_mxu(ins[0])))
    elif op == "Tanh":
        put(jnp.tanh(_mxu(ins[0])))
    elif op == "Softmax":
        put(jax.nn.softmax(_f32(jnp.asarray(ins[0])),
                           axis=int(_attr(node, "axis", -1))))
    elif op == "Exp":
        put(jnp.exp(_mxu(ins[0])))
    elif op == "Sqrt":
        put(jnp.sqrt(_mxu(ins[0])))
    elif op == "Pow":
        put(jnp.power(_f32(jnp.asarray(ins[0])), jnp.asarray(ins[1])))
    elif op == "Neg":
        put(-ins[0])
    elif op == "Erf":
        put(lax.erf(_mxu(ins[0])))
    elif op == "Clip":
        lo = ins[1] if len(ins) > 1 and ins[1] is not None else -jnp.inf
        hi = ins[2] if len(ins) > 2 and ins[2] is not None else jnp.inf
        lo = _attr(node, "min", lo)
        hi = _attr(node, "max", hi)
        put(jnp.clip(ins[0], lo, hi))
    elif op in ("Add", "Sub", "Mul", "Div", "Max", "Min"):
        a, b_ = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        if op == "Add":
            put(a + b_)
        elif op == "Sub":
            put(a - b_)
        elif op == "Mul":
            put(a * b_)
        elif op == "Div":
            if jnp.issubdtype(a.dtype, jnp.integer) and \
                    jnp.issubdtype(b_.dtype, jnp.integer):
                # ONNX integer Div truncates toward zero (C semantics);
                # // floors — adjust when signs differ and there is a
                # remainder (twin: onnx_exec Div branch)
                q = a // b_
                adj = (a % b_ != 0) & ((a < 0) != (b_ < 0))
                put(q + adj.astype(q.dtype))
            else:
                put(a / b_)
        elif op == "Max":
            put(jnp.maximum(a, b_))
        else:
            put(jnp.minimum(a, b_))
    elif op == "MaxPool":
        put(_pool(node, ins[0], "max"))
    elif op == "AveragePool":
        put(_pool(node, ins[0], "avg"))
    elif op == "GlobalAveragePool":
        x = _acc(ins[0])
        put(x.mean(axis=tuple(range(2, x.ndim)), keepdims=True))
    elif op == "Concat":
        put(jnp.concatenate([jnp.asarray(v) for v in ins],
                            axis=int(_attr(node, "axis"))))
    elif op == "Split":
        axis = int(_attr(node, "axis", 0))
        split = _attr(node, "split")
        if split is None and len(ins) > 1 and ins[1] is not None:
            split = [int(s) for s in need_static(ins[1], "split sizes")]
        x = jnp.asarray(ins[0])
        if split is None:
            k = int(_attr(node, "num_outputs", len(node.outputs)))
            length = x.shape[axis]
            base = -(-length // k)
            split = [base] * (k - 1) + [length - base * (k - 1)]
        offs = np.cumsum([0] + list(split))
        put(*[
            lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]), axis=axis)
            for i in range(len(split))
        ])
    elif op == "Slice":
        if "starts" in node.attrs:  # opset < 10
            put(_slice_op(jnp.asarray(ins[0]), _attr(node, "starts"),
                          _attr(node, "ends"), _attr(node, "axes"), None))
        else:
            starts = need_static(ins[1], "starts")
            ends = need_static(ins[2], "ends")
            axes = need_static(ins[3], "axes") \
                if len(ins) > 3 and ins[3] is not None else None
            steps = need_static(ins[4], "steps") \
                if len(ins) > 4 and ins[4] is not None else None
            put(_slice_op(jnp.asarray(ins[0]), starts, ends, axes, steps))
    elif op == "Reshape":
        shape = [int(s) for s in need_static(ins[1], "target shape")]
        x = jnp.asarray(ins[0])
        if int(_attr(node, "allowzero", 0)) == 0:
            shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
        put(x.reshape(shape))
    elif op == "Transpose":
        put(jnp.transpose(jnp.asarray(ins[0]), _attr(node, "perm")))
    elif op == "Flatten":
        ax = int(_attr(node, "axis", 1))
        x = jnp.asarray(ins[0])
        put(x.reshape(int(np.prod(x.shape[:ax], initial=1)), -1))
    elif op == "Squeeze":
        axes = _attr(node, "axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = [int(a) for a in need_static(ins[1], "axes")]
        x = jnp.asarray(ins[0])
        put(jnp.squeeze(x, axis=tuple(int(a) for a in axes))
            if axes else jnp.squeeze(x))
    elif op == "Unsqueeze":
        axes = _attr(node, "axes")
        if axes is None:
            axes = [int(a) for a in need_static(ins[1], "axes")]
        out = jnp.asarray(ins[0])
        out_rank = out.ndim + len(axes)
        for a in sorted(int(a) % out_rank for a in axes):
            out = jnp.expand_dims(out, a)
        put(out)
    elif op == "Expand":
        shape = tuple(int(s) for s in need_static(ins[1], "target shape"))
        x = jnp.asarray(ins[0])
        put(jnp.broadcast_to(x, np.broadcast_shapes(x.shape, shape)))
    elif op == "Tile":
        put(jnp.tile(jnp.asarray(ins[0]),
                     [int(r) for r in need_static(ins[1], "repeats")]))
    elif op == "Gather":
        idx = ins[1]
        idx = idx.astype(jnp.int32) if not _is_static(idx) \
            else np.asarray(idx).astype(np.int64)
        put(jnp.take(jnp.asarray(ins[0]), idx,
                     axis=int(_attr(node, "axis", 0))))
    elif op == "Cast":
        to = int(_attr(node, "to"))
        if to not in _CAST_DTYPES:
            raise UnsupportedOnnxOp(f"Cast to TensorProto dtype code {to}")
        put(jnp.asarray(ins[0]).astype(_CAST_DTYPES[to]))
    elif op == "Resize":
        scales = ins[2] if len(ins) > 2 and ins[2] is not None \
            and np.size(ins[2]) else None
        sizes = ins[3] if len(ins) > 3 and ins[3] is not None else None
        if scales is not None:
            scales = need_static(scales, "scales")
        if sizes is not None:
            sizes = need_static(sizes, "sizes")
        put(_resize(node, jnp.asarray(ins[0]), scales, sizes))
    elif op in ("ReduceMean", "ReduceSum", "ReduceMax"):
        axes = _attr(node, "axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = [int(a) for a in need_static(ins[1], "axes")]
        axes = tuple(axes) if axes else None
        keep = bool(int(_attr(node, "keepdims", 1)))
        fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
              "ReduceMax": jnp.max}[op]
        x = jnp.asarray(ins[0]) if op == "ReduceMax" else _acc(ins[0])
        put(fn(x, axis=axes, keepdims=keep))
    elif op in ("Identity", "Dropout"):
        put(ins[0])
    elif op == "Where":
        put(jnp.where(jnp.asarray(ins[0]), jnp.asarray(ins[1]),
                      jnp.asarray(ins[2])))
    elif op == "Equal":
        put(jnp.asarray(ins[0]) == jnp.asarray(ins[1]))
    elif op == "LSTM":
        put(*_rnn_scan(node, ins, "LSTM"))
    elif op == "GRU":
        put(*_rnn_scan(node, ins, "GRU"))
    elif op == "ConvTranspose":
        put(_conv_transpose(node, ins[0], ins[1],
                            ins[2] if len(ins) > 2 else None))
    elif op == "InstanceNormalization":
        x, scale, bias = (_f32(jnp.asarray(v)) for v in ins[:3])
        eps = float(_attr(node, "epsilon", 1e-5))
        sp = tuple(range(2, x.ndim))
        mean = x.mean(axis=sp, keepdims=True)
        var = x.var(axis=sp, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        put((x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape))
    elif op == "GroupNormalization":  # opset 18
        x, scale, bias = (_f32(jnp.asarray(v)) for v in ins[:3])
        eps = float(_attr(node, "epsilon", 1e-5))
        ng = int(_attr(node, "num_groups"))
        n, c = x.shape[:2]
        xg = x.reshape((n, ng, c // ng) + x.shape[2:])
        red = tuple(range(2, xg.ndim))
        mean = xg.mean(axis=red, keepdims=True)
        var = xg.var(axis=red, keepdims=True)
        y = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        put(y * scale.reshape(shape) + bias.reshape(shape))
    elif op == "LayerNormalization":  # opset 17
        x = _f32(jnp.asarray(ins[0]))
        scale = _f32(jnp.asarray(ins[1]))
        bias = _f32(jnp.asarray(ins[2])) \
            if len(ins) > 2 and ins[2] is not None else None
        eps = float(_attr(node, "epsilon", 1e-5))
        axis = int(_attr(node, "axis", -1)) % x.ndim
        red = tuple(range(axis, x.ndim))
        mean = x.mean(axis=red, keepdims=True)
        inv = 1.0 / jnp.sqrt(x.var(axis=red, keepdims=True) + eps)
        y = (x - mean) * inv * scale
        if bias is not None:
            y = y + bias
        put(y, mean, inv)
    elif op == "HardSigmoid":
        alpha = float(_attr(node, "alpha", 0.2))
        beta = float(_attr(node, "beta", 0.5))
        put(jnp.clip(alpha * _mxu(ins[0]) + beta, 0.0, 1.0))
    elif op == "HardSwish":  # opset 14: x * hardsigmoid(x; 1/6, 1/2)
        x = _mxu(ins[0])
        put(x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0))
    elif op == "Elu":
        alpha = float(_attr(node, "alpha", 1.0))
        x = _mxu(ins[0])
        put(jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0)))
    elif op == "Softplus":
        put(jnp.logaddexp(0.0, _mxu(ins[0])))
    elif op == "PRelu":
        x, slope = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        put(jnp.where(x < 0, slope * x, x))
    elif op == "Gelu":  # opset 20
        x = _mxu(ins[0])
        if _attr(node, "approximate", "none") == "tanh":
            put(0.5 * x * (1.0 + jnp.tanh(
                np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3))))
        else:
            put(0.5 * x * (1.0 + lax.erf(x / np.sqrt(2.0))))
    elif op == "Mish":  # opset 18: x * tanh(softplus(x))
        x = _mxu(ins[0])
        put(x * jnp.tanh(jnp.logaddexp(0.0, x)))
    elif op in ("Abs", "Floor", "Ceil", "Round", "Sign", "Not"):
        fn = {"Abs": jnp.abs, "Floor": jnp.floor, "Ceil": jnp.ceil,
              "Round": jnp.round,  # rounds half-to-even, like ONNX
              "Sign": jnp.sign, "Not": jnp.logical_not}[op]
        put(fn(jnp.asarray(ins[0])))
    elif op in ("Log", "Sin", "Cos", "Reciprocal"):
        x = _mxu(ins[0])
        put({"Log": jnp.log, "Sin": jnp.sin, "Cos": jnp.cos,
             "Reciprocal": lambda v: 1.0 / v}[op](x))
    elif op in ("Greater", "Less", "GreaterOrEqual", "LessOrEqual",
                "And", "Or", "Xor"):
        a, b_ = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        put({"Greater": jnp.greater, "Less": jnp.less,
             "GreaterOrEqual": jnp.greater_equal,
             "LessOrEqual": jnp.less_equal, "And": jnp.logical_and,
             "Or": jnp.logical_or, "Xor": jnp.logical_xor}[op](a, b_))
    elif op == "Mod":
        a, b_ = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        put(jnp.fmod(a, b_) if int(_attr(node, "fmod", 0))
            else jnp.mod(a, b_))
    elif op in ("ReduceMin", "ReduceProd", "ReduceL2"):
        axes = _attr(node, "axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = [int(a) for a in need_static(ins[1], "axes")]
        axes = tuple(axes) if axes else None
        keep = bool(int(_attr(node, "keepdims", 1)))
        if op == "ReduceL2":
            put(jnp.sqrt(jnp.sum(
                jnp.square(_f32(jnp.asarray(ins[0]))),
                axis=axes, keepdims=keep)))
        else:
            fn = {"ReduceMin": jnp.min, "ReduceProd": jnp.prod}[op]
            x = _acc(ins[0]) if op == "ReduceProd" else jnp.asarray(ins[0])
            put(fn(x, axis=axes, keepdims=keep))
    elif op in ("ArgMax", "ArgMin"):
        if int(_attr(node, "select_last_index", 0)):
            raise UnsupportedOnnxOp(f"{op} select_last_index")
        axis = int(_attr(node, "axis", 0))
        keep = bool(int(_attr(node, "keepdims", 1)))
        fn = jnp.argmax if op == "ArgMax" else jnp.argmin
        r = fn(jnp.asarray(ins[0]), axis=axis).astype(jnp.int64)
        put(jnp.expand_dims(r, axis) if keep else r)
    elif op == "CumSum":
        axis = int(np.asarray(need_static(ins[1], "axis")).item())
        x = jnp.asarray(ins[0])
        if int(_attr(node, "reverse", 0)):
            x = jnp.flip(x, axis)
        r = jnp.cumsum(x, axis=axis, dtype=x.dtype)
        if int(_attr(node, "exclusive", 0)):
            r = jnp.concatenate([
                jnp.zeros_like(lax.slice_in_dim(r, 0, 1, axis=axis)),
                lax.slice_in_dim(r, 0, x.shape[axis] - 1, axis=axis),
            ], axis=axis)
        if int(_attr(node, "reverse", 0)):
            r = jnp.flip(r, axis)
        put(r)
    elif op == "Pad":
        mode = _attr(node, "mode", "constant")
        if "pads" in node.attrs:  # opset < 11
            pads = [int(p) for p in _attr(node, "pads")]
            cval = _attr(node, "value", 0.0)
            axes = None
        else:
            pads = [int(p) for p in need_static(ins[1], "pads")]
            cval = ins[2] if len(ins) > 2 and ins[2] is not None else 0.0
            axes = [int(a) for a in need_static(ins[3], "axes")] \
                if len(ins) > 3 and ins[3] is not None else None
        x = jnp.asarray(ins[0])
        if axes is None:
            axes = list(range(x.ndim))
        half = len(pads) // 2
        cfg = [(0, 0)] * x.ndim
        for i, ax in enumerate(axes):
            cfg[ax % x.ndim] = (pads[i], pads[half + i])
        jmode = {"constant": "constant", "reflect": "reflect",
                 "edge": "edge", "wrap": "wrap"}.get(mode)
        if jmode is None:
            raise UnsupportedOnnxOp(f"Pad mode '{mode}'")
        if jmode == "constant":
            put(jnp.pad(x, cfg, constant_values=np.asarray(
                need_static(cval, "constant value")).item()))
        else:
            put(jnp.pad(x, cfg, mode=jmode))
    elif op == "DepthToSpace":
        bs = int(_attr(node, "blocksize"))
        mode = _attr(node, "mode", "DCR")
        x = jnp.asarray(ins[0])
        n, c, h, w = x.shape
        if mode == "DCR":
            y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
            y = y.transpose(0, 3, 4, 1, 5, 2)
        else:  # CRD (torch PixelShuffle)
            y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
            y = y.transpose(0, 1, 4, 2, 5, 3)
        put(y.reshape(n, c // (bs * bs), h * bs, w * bs))
    elif op == "SpaceToDepth":
        bs = int(_attr(node, "blocksize"))
        x = jnp.asarray(ins[0])
        n, c, h, w = x.shape
        y = x.reshape(n, c, h // bs, bs, w // bs, bs)
        y = y.transpose(0, 3, 5, 1, 2, 4)
        put(y.reshape(n, c * bs * bs, h // bs, w // bs))
    elif op == "Einsum":
        put(jnp.einsum(_attr(node, "equation"), *[_mxu(v) for v in ins],
                       preferred_element_type=_pref()))
    elif op == "Trilu":
        k = int(np.asarray(need_static(
            ins[1], "diagonal offset")).item()) \
            if len(ins) > 1 and ins[1] is not None else 0
        fn = jnp.triu if int(_attr(node, "upper", 1)) else jnp.tril
        put(fn(jnp.asarray(ins[0]), k))
    elif op == "TopK":
        x = jnp.asarray(ins[0])
        k = int(np.asarray(need_static(ins[1], "k")).item())
        axis = int(_attr(node, "axis", -1)) % x.ndim
        largest = int(_attr(node, "largest", 1))
        xl = jnp.moveaxis(x, axis, -1)
        # lax.top_k resolves ties to the lower index, matching the
        # oracle's stable argsort (and ONNX Runtime)
        vals, idx = lax.top_k(xl if largest else -xl, k)
        if not largest:
            vals = -vals
        put(jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx, -1, axis).astype(jnp.int64))
    elif op == "GatherElements":
        x, idx = jnp.asarray(ins[0]), jnp.asarray(ins[1])
        put(jnp.take_along_axis(x, idx.astype(jnp.int32),
                                axis=int(_attr(node, "axis", 0))))
    elif op == "LogSoftmax":
        put(jax.nn.log_softmax(_f32(jnp.asarray(ins[0])),
                               axis=int(_attr(node, "axis", -1))))
    elif op == "GlobalMaxPool":
        x = jnp.asarray(ins[0])
        put(x.max(axis=tuple(range(2, x.ndim)), keepdims=True))
    elif op == "Selu":
        alpha = float(_attr(node, "alpha", 1.6732631921768188))
        gamma = float(_attr(node, "gamma", 1.0507009873554805))
        x = _mxu(ins[0])
        put(gamma * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0)))
    elif op == "Celu":
        alpha = float(_attr(node, "alpha", 1.0))
        x = _mxu(ins[0])
        put(jnp.maximum(x, 0) + jnp.minimum(
            0, alpha * (jnp.exp(x / alpha) - 1.0)))
    # ---- quantized-model ops (QDQ + QOperator; the pre-quantized-artifact
    # path the reference's RKNN backend consumes, detector.py:705-869).
    # Quantization math runs fp32 even under the bf16 policy — scales and
    # rounding boundaries are the model's numerics, not a precision knob.
    elif op == "QuantizeLinear":
        x = _f32(jnp.asarray(ins[0]))
        zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
        qdt = _qdt(zp)
        s, z = _quant_axis_j(x.ndim, ins[1], zp, int(_attr(node, "axis", 1)))
        info = np.iinfo(qdt)
        y = jnp.rint(x / s) + z.astype(jnp.float32)
        put(jnp.clip(y, info.min, info.max).astype(qdt))
    elif op == "DequantizeLinear":
        x = jnp.asarray(ins[0])
        zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
        s, z = _quant_axis_j(x.ndim, ins[1], zp, int(_attr(node, "axis", 1)))
        put((x.astype(jnp.int32) - z).astype(jnp.float32) * s)
    elif op == "DynamicQuantizeLinear":
        x = _f32(jnp.asarray(ins[0]))
        xmin = jnp.minimum(x.min(), 0.0)  # spec: range always includes 0
        xmax = jnp.maximum(x.max(), 0.0)
        rng = xmax - xmin
        # explicit reciprocal multiply — see the numpy twin's comment
        scale = jnp.where(rng > 0, rng * np.float32(1.0 / 255.0), 1.0)
        zp_f = jnp.clip(jnp.rint(-xmin / scale), 0, 255)
        y = jnp.clip(jnp.rint(x / scale) + zp_f, 0, 255).astype(jnp.uint8)
        put(y, scale.astype(jnp.float32), zp_f.astype(jnp.uint8))
    elif op == "MatMulInteger":
        azp = ins[2] if len(ins) > 2 and ins[2] is not None else None
        bzp = ins[3] if len(ins) > 3 and ins[3] is not None else None
        put(_matmul_int_j(ins[0], ins[1], azp, bzp))
    elif op == "ConvInteger":
        xzp = ins[2] if len(ins) > 2 and ins[2] is not None else None
        wzp = ins[3] if len(ins) > 3 and ins[3] is not None else None
        put(_conv_int_j(node, jnp.asarray(ins[0]), jnp.asarray(ins[1]),
                        xzp, wzp))
    elif op == "QLinearConv":
        x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp = ins[:8]
        b = ins[8] if len(ins) > 8 and ins[8] is not None else None
        acc = _conv_int_j(node, jnp.asarray(x), jnp.asarray(w), x_zp, w_zp)
        if b is not None:
            acc = acc + jnp.asarray(b).astype(jnp.int32).reshape(
                (1, -1) + (1,) * (acc.ndim - 2))
        wsc = jnp.asarray(w_s).astype(jnp.float32)
        if wsc.ndim == 1 and wsc.shape[0] > 1:  # per-out-channel
            wsc = wsc.reshape((1, -1) + (1,) * (acc.ndim - 2))
        mul = (jnp.asarray(x_s).astype(jnp.float32).reshape(()) * wsc
               / jnp.asarray(y_s).astype(jnp.float32).reshape(()))
        put(_requant_j(acc, mul, y_zp, _qdt(y_zp)))
    elif op == "QLinearMatMul":
        a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp = ins[:8]
        acc = _matmul_int_j(a, b, a_zp, b_zp)
        mul = (jnp.asarray(a_s).astype(jnp.float32).reshape(())
               * jnp.asarray(b_s).astype(jnp.float32).reshape(())
               / jnp.asarray(y_s).astype(jnp.float32).reshape(()))
        put(_requant_j(acc, mul, y_zp, _qdt(y_zp)))
    elif op == "NonMaxSuppression":
        max_out = int(np.asarray(need_static(
            ins[2], "max_output_boxes_per_class"
        )).item()) if len(ins) > 2 and ins[2] is not None else 0
        iou_thr = ins[3] if len(ins) > 3 and ins[3] is not None else 0.0
        score_thr = ins[4] if len(ins) > 4 and ins[4] is not None else None
        iou_thr = jnp.asarray(iou_thr, jnp.float32).reshape(())
        if score_thr is not None:
            score_thr = jnp.asarray(score_thr, jnp.float32).reshape(())
        put(_nms_padded_j(node, ins[0], ins[1], max_out, iou_thr,
                          score_thr))
    elif op == "ScatterND":
        data = jnp.asarray(ins[0])
        indices = jnp.asarray(ins[1]).astype(jnp.int32)
        updates = jnp.asarray(ins[2]).astype(data.dtype)
        reduction = _attr(node, "reduction", "none") or "none"
        ref = data.at[tuple(jnp.moveaxis(indices, -1, 0))]
        put({
            "none": ref.set, "add": ref.add, "mul": ref.multiply,
            "min": ref.min, "max": ref.max,
        }[reduction](updates))
    elif op == "ConstantOfShape":
        # shape machinery: must fold (twin of the onnx_exec branch; only
        # reached traced when a traced tensor leaked into the shape)
        shape = [int(s) for s in need_static(ins[0], "shape")]
        v = _attr(node, "value")
        fill = v.reshape(-1)[0] if v is not None else np.float32(0)
        put(np.full(shape, fill))
    elif op == "Range":
        s, l_, d = (np.asarray(need_static(v, "Range bounds"))
                    for v in ins[:3])
        put(np.arange(s.item(), l_.item(), d.item(),
                      dtype=np.result_type(s, l_, d)))
    else:
        raise UnsupportedOnnxOp(
            f"op '{op}' (node '{node.name}') is outside the supported set"
        )


# nodes whose outputs stay concrete even when fed traced tensors: shape
# machinery must constant-fold for the jitted program to be static-shaped
_ALWAYS_STATIC = {"Shape"}


def _run(g: OnnxGraph, feeds: Dict[str, object],
         outputs: Optional[Sequence[str]] = None) -> List[object]:
    """Trace-or-fold evaluation: nodes whose inputs are all concrete run
    through onnx_exec._eval_node (compile-time constant folding); nodes
    touching a traced tensor lower to jnp/lax via _eval_node_jax. ``Shape``
    of a traced tensor returns its static trace-time shape concretely, so
    shape math downstream stays folded."""
    values: Dict[str, object] = {"": None}
    values.update(g.initializers)
    values.update(feeds)
    missing = [i for i in g.inputs if i not in values]
    if missing:
        raise ValueError(f"missing graph inputs: {missing}")
    cd = _COMPUTE.get()  # bf16 policy: downcast traced float outputs

    pending: List[OnnxNode] = list(g.nodes)
    while pending:
        progressed = False
        deferred: List[OnnxNode] = []
        for node in pending:
            if any(i and i not in values for i in node.inputs):
                deferred.append(node)
                continue
            ins = [values[i] for i in node.inputs]
            if node.op_type in _ALWAYS_STATIC:
                # static trace-time shape, concrete result; opset-15
                # Shape carries optional start/end slicing attributes
                if node.outputs[0]:
                    shp = np.asarray(np.shape(ins[0]), dtype=np.int64)
                    start = node.attrs.get("start")
                    end = node.attrs.get("end")
                    if start is not None or end is not None:
                        shp = shp[slice(
                            int(start) if start is not None else None,
                            int(end) if end is not None else None,
                        )]
                    values[node.outputs[0]] = shp
            elif all(_is_static(v) for v in ins):
                _eval_node(node, values)
            else:
                _eval_node_jax(node, values)
                if cd is not None:
                    # fp32 islands emit fp32; bring every traced float
                    # back to the policy dtype so elementwise chains and
                    # HBM traffic between islands ride bf16
                    for o in node.outputs:
                        v = values.get(o) if o else None
                        if (
                            isinstance(v, (jax.Array, jax.core.Tracer))
                            and jnp.issubdtype(v.dtype, jnp.floating)
                            and v.dtype != cd
                        ):
                            values[o] = v.astype(cd)
            progressed = True
        if not progressed:
            blocked = [n.op_type for n in deferred[:5]]
            raise ValueError(
                f"graph is not schedulable (cycle or missing producer); "
                f"blocked at {blocked}"
            )
        pending = deferred

    out_names = list(outputs) if outputs is not None else g.outputs
    missing = [o for o in out_names if o not in values]
    if missing:
        raise ValueError(f"graph did not produce outputs: {missing}")
    return [values[o] for o in out_names]


def compile_graph(g: OnnxGraph, outputs: Optional[Sequence[str]] = None):
    """Return ``fn(feeds) -> [outputs]`` suitable for ``jax.jit`` closure.

    ``feeds`` maps graph input names to arrays (jnp tracers under jit).
    The function re-traces per input shape — exactly the bucketed-compile
    behavior the engines already manage."""
    return partial(_run, g, outputs=outputs)


def graph_input_name(g: OnnxGraph) -> str:
    """The single data input of a serving graph (initializers are already
    excluded by onnx_lite's reader)."""
    if len(g.inputs) != 1:
        raise ValueError(
            f"expected a single-input serving graph, found inputs {g.inputs}"
        )
    return g.inputs[0]
