"""ONNX checkpoint ingestion via the dependency-free protobuf reader/writer.

torch's exporter needs the onnx package (absent here), so the fixture writes
an Ultralytics-named weights .onnx with our own minimal writer, reads it back
with the wire-format parser, and verifies end-to-end loader fidelity against
the torch mirror. Real torch-exported models keep the same initializer names.
"""

import numpy as np
import torch

import jax.numpy as jnp

from realtime_analytics_tpu.models.onnx_lite import (
    read_onnx_initializers,
    write_onnx_initializers,
)
from realtime_analytics_tpu.models.weights import load_yolo_checkpoint
from realtime_analytics_tpu.models.yolo import build_yolo

from torch_mirror import TorchYoloMirror


def test_roundtrip_all_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.float32": rng.normal(size=(3, 4, 5)).astype(np.float32),
        "b.float16": rng.normal(size=(7,)).astype(np.float16),
        "c.int64": rng.integers(-5, 5, (2, 2)).astype(np.int64),
        "d.int8": rng.integers(-127, 127, (4, 8)).astype(np.int8),
        "e.scalarish": np.asarray([3.5], dtype=np.float32),
    }
    path = tmp_path / "weights.onnx"
    write_onnx_initializers(str(path), tensors)
    back = read_onnx_initializers(str(path))
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(back[k], tensors[k])


def test_packed_int64_data_negative_values(tmp_path):
    """torch-exported models carry shape constants in TensorProto.int64_data
    (not raw_data); negatives are 10-byte two's-complement varints that must
    fold back to signed — round-1 advisor found they raised OverflowError."""
    from realtime_analytics_tpu.models.onnx_lite import (
        _len_delimited,
        _varint,
    )

    values = [-1, -123456789012345, 0, 7, 2**62]
    packed = b"".join(_varint(v & ((1 << 64) - 1)) for v in values)
    t = (
        _varint(1 << 3) + _varint(len(values))  # dims: [5]
        + _varint(2 << 3) + _varint(7)  # data_type = int64
        + _len_delimited(8, b"shape_const")  # name
        + _len_delimited(7, packed)  # int64_data, packed
    )
    graph = _len_delimited(5, t)
    model = _varint(1 << 3) + _varint(8) + _len_delimited(7, graph)
    path = tmp_path / "neg.onnx"
    path.write_bytes(model)
    out = read_onnx_initializers(str(path))
    np.testing.assert_array_equal(
        out["shape_const"], np.asarray(values, dtype=np.int64)
    )


def test_yolo_loads_from_onnx_with_fidelity(tmp_path):
    torch.manual_seed(12)
    jm = build_yolo("yolov8", "n", nc=80)
    tm = TorchYoloMirror(jm).eval()
    path = tmp_path / "yolov8n.onnx"
    write_onnx_initializers(
        str(path), {k: v.numpy() for k, v in tm.ultralytics_state_dict().items()}
    )

    params = load_yolo_checkpoint(jm, str(path))
    assert params is not None

    x = torch.rand(1, 3, 160, 160)
    t_boxes, t_scores = tm(x)
    out = jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["scores"]), t_scores.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes_xyxy"]), t_boxes.numpy(), atol=1e-1, rtol=1e-3
    )


def test_fp16_onnx_weights_upcast(tmp_path):
    jm = build_yolo("yolov8", "n", nc=8)
    tm = TorchYoloMirror(jm).eval()
    sd = {k: v.numpy().astype(np.float16)
          for k, v in tm.ultralytics_state_dict().items()}
    path = tmp_path / "half.onnx"
    write_onnx_initializers(str(path), sd)
    params = load_yolo_checkpoint(jm, str(path))
    assert params is not None  # fp16 initializers upcast to f32 on read
