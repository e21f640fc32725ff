"""Pallas MXU one-hot row gather: bit-exactness vs the NumPy oracle, and
batched_nms equivalence between the XLA and Pallas gather impls.

The gather moves payload through the int8 MXU as raw bytes (see
ops/pallas_gather.py), so results must be BIT-identical — not just close —
for any float payload, including values a bf16 matmul would round.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.ops.pallas_gather import (
    pallas_row_gather,
    row_gather_reference,
)


@pytest.mark.parametrize(
    "n,m,p,k",
    [
        (3, 100, 6, 7),       # ragged everything
        (1, 128, 3, 128),     # exactly one tile
        (2, 1024, 5, 64),     # multiple tiles
        (2, 8400, 5, 512),    # the serving shape (boxes+class, pre-NMS)
        (1, 300, 1, 4),       # single-column payload
    ],
)
def test_gather_bit_exact(n, m, p, k):
    rng = np.random.default_rng(n * 1000 + m + p + k)
    payload = (
        rng.normal(size=(n, m, p)) * rng.choice([1.0, 640.0, 1e-3], (n, m, p))
    ).astype(np.float32)
    idx = rng.integers(0, m, (n, k)).astype(np.int32)
    out = np.asarray(
        pallas_row_gather(jnp.asarray(payload), jnp.asarray(idx), interpret=True)
    )
    ref = row_gather_reference(payload, idx)
    assert np.array_equal(out, ref)


def test_gather_duplicate_and_boundary_indices():
    rng = np.random.default_rng(0)
    payload = rng.normal(size=(2, 260, 4)).astype(np.float32)
    idx = np.array(
        [[0, 0, 259, 128, 127, 128], [5, 5, 5, 5, 0, 259]], np.int32
    )
    out = np.asarray(
        pallas_row_gather(jnp.asarray(payload), jnp.asarray(idx), interpret=True)
    )
    assert np.array_equal(out, row_gather_reference(payload, idx))


def test_gather_special_float_values():
    """Bytes-through-MXU must preserve every bit pattern: denormals,
    infinities, NaN payloads, negative zero."""
    specials = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-40, -1e-40, 3.14159],
        np.float32,
    )
    payload = np.tile(specials, (1, 16, 1)).reshape(1, 16, 8).astype(np.float32)
    idx = np.array([[3, 0, 15]], np.int32)
    out = np.asarray(
        pallas_row_gather(jnp.asarray(payload), jnp.asarray(idx), interpret=True)
    )
    ref = row_gather_reference(payload, idx)
    assert np.array_equal(
        out.view(np.uint32), ref.view(np.uint32)
    )  # bitwise, so NaN == NaN


def test_batched_nms_gather_impls_identical():
    from realtime_analytics_tpu.ops.nms import batched_nms

    rng = np.random.default_rng(7)
    n, m = 3, 900
    boxes = np.zeros((n, m, 4), np.float32)
    xy = rng.uniform(0, 600, (n, m, 2))
    wh = rng.uniform(5, 120, (n, m, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    scores = rng.uniform(0, 1, (n, m)).astype(np.float32)
    scores[scores < 0.4] = 0.0  # conf-masked contract
    classes = rng.integers(0, 8, (n, m)).astype(np.int32)

    kw = dict(iou_threshold=0.45, max_det=50, pre_topk=256)
    ref = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        gather_impl="xla", **kw,
    )
    out = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        gather_impl="pallas_interpret", **kw,
    )
    for a, b, name in zip(ref, out, ("boxes", "scores", "classes", "nvalid")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_engine_gather_impl_selection():
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(model_path="/nonexistent.pt", device="cpu",
                         input_size=[64, 64], warmup=False)
    eng = JaxYoloEngine(cfg)
    assert eng._nms_gather_impl() == "xla"  # cpu -> xla
    eng.config.pallas_gather = "on"
    # forced on off-TPU maps to the interpreter (Mosaic-only kernel)
    assert eng._nms_gather_impl() == "pallas_interpret"
    eng.config.pallas_gather = "off"
    assert eng._nms_gather_impl() == "xla"
