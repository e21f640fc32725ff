"""AOT serving artifacts (engine/export.py) — the TensorRT .engine analog
(reference detector.py:382-466 serves from prebuilt engine files).

The acceptance bar: an ExportedYoloEngine serving from a .rvae file is
bit-identical to the live JaxYoloEngine it was exported from, on every
exported (resolution x bucket) program, and fails loudly (with the
available-program list) on anything not exported.
"""

import json
import os
import zipfile

import numpy as np
import pytest

from realtime_analytics_tpu.config import ConfigError, DetectorConfig
from realtime_analytics_tpu.engine.detector import JaxYoloEngine, create_detector
from realtime_analytics_tpu.engine.export import (
    ExportedYoloEngine,
    _flatten_params,
    _unflatten_params,
    export_serving_artifact,
)

INPUT = 64
SRC_PICK = (192, 192)  # 3x on both axes: host pixel-pick path ("sel")
SRC_FRAC = (100, 160)  # fractional ratio


def _det_cfg(model_path: str, **kw) -> DetectorConfig:
    base = dict(
        model_path=model_path,
        model_type="yolov8",
        input_size=[INPUT, INPUT],
        batch_buckets=[1, 2],
        max_batch_size=2,
        confidence_threshold=0.01,  # random init: keep real detections
        warmup=False,
    )
    base.update(kw)
    return DetectorConfig(**base)


@pytest.fixture(scope="module")
def live_engine():
    return JaxYoloEngine(_det_cfg("missing_yolov8n.pt"))


@pytest.fixture(scope="module")
def artifact(live_engine, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rvae") / "test.rvae")
    meta = export_serving_artifact(
        live_engine, path, src_hws=[SRC_PICK, SRC_FRAC]
    )
    return path, meta


@pytest.fixture(scope="module")
def exported_engine(artifact):
    path, _ = artifact
    return ExportedYoloEngine(_det_cfg(path))


def test_flatten_roundtrip_with_list_nodes():
    params = {
        "layers": {
            "0": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "2": {"m": [{"w": np.ones(2, np.float32)},
                        {"w": np.zeros(3, np.float32)}]},
        }
    }
    flat = _flatten_params(params)
    assert set(flat) == {"layers/0/w", "layers/2/m/#0/w", "layers/2/m/#1/w"}
    back = _unflatten_params(flat)
    assert isinstance(back["layers"]["2"]["m"], list)
    np.testing.assert_array_equal(
        back["layers"]["0"]["w"], params["layers"]["0"]["w"]
    )
    np.testing.assert_array_equal(
        back["layers"]["2"]["m"][1]["w"], params["layers"]["2"]["m"][1]["w"]
    )


def test_flatten_roundtrip_escapes_onnx_scoped_names():
    """Graph-backed engines carry RAW ONNX initializer names as param
    keys — torch 2.x constant-folded exports produce '/'-scoped names
    like '/model.22/Constant_output_0'. Flatten must escape (not reject)
    them, and unflatten must restore them exactly."""
    params = {
        "/model.22/Constant_output_0": np.arange(3, dtype=np.float32),
        "#leading.hash": np.ones(2, np.float32),
        "pct%2Fliteral": np.zeros(1, np.float32),
        "plain.dotted": {"nested/slash": np.ones(1, np.float32)},
    }
    flat = _flatten_params(params)
    back = _unflatten_params(flat)
    assert set(back) == set(params)
    np.testing.assert_array_equal(
        back["/model.22/Constant_output_0"],
        params["/model.22/Constant_output_0"],
    )
    np.testing.assert_array_equal(
        back["plain.dotted"]["nested/slash"],
        params["plain.dotted"]["nested/slash"],
    )


def test_artifact_contents(artifact):
    path, meta = artifact
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert "meta.json" in names
    assert {f"programs/{p['name']}" for p in meta["programs"]} <= names
    # both resolutions x both buckets
    assert len(meta["programs"]) == 4
    assert meta["input_size"] == [INPUT, INPUT]


def test_roundtrip_bit_identical(live_engine, exported_engine):
    rng = np.random.default_rng(7)
    for hw in (SRC_PICK, SRC_FRAC):
        for n in (1, 2):
            frames = rng.integers(0, 256, (n, *hw, 3), dtype=np.uint8)
            a = live_engine.predict_arrays(frames.copy())
            b = exported_engine.predict_arrays(frames.copy())
            np.testing.assert_array_equal(a.num_valid, b.num_valid)
            assert int(a.num_valid.sum()) > 0, (
                "trivial comparison: no detections survived — lower the "
                "confidence threshold"
            )
            np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)
            np.testing.assert_array_equal(a.scores, b.scores)
            np.testing.assert_array_equal(a.class_ids, b.class_ids)


def test_factory_routes_rvae(artifact):
    path, _ = artifact
    eng = create_detector(_det_cfg(path))
    assert isinstance(eng, ExportedYoloEngine)


def test_engine_family_mismatch_rejected(artifact):
    # a YOLO artifact served under model_type resnet must refuse loudly
    path, _ = artifact
    with pytest.raises(ConfigError, match="artifact serves a 'yolo' engine"):
        create_detector(_det_cfg(path, model_type="resnet",
                                 resnet_num_classes=10))


def test_unexported_resolution_raises(exported_engine):
    frames = np.zeros((1, 480, 640, 3), np.uint8)
    with pytest.raises(ConfigError, match="480x640") as ei:
        exported_engine.predict_arrays(frames)
    # the error carries the available-program list
    assert "192x192_b1" in str(ei.value)


def test_oversized_batch_raises(exported_engine):
    frames = np.zeros((3, *SRC_PICK, 3), np.uint8)
    with pytest.raises(ValueError, match="largest exported bucket 2"):
        exported_engine.predict_arrays(frames)


def test_warmup_times_exported_buckets(artifact):
    path, _ = artifact
    eng = ExportedYoloEngine(_det_cfg(path))
    eng.warmup(SRC_PICK)
    costs = eng._bucket_cost_ms[SRC_PICK]
    assert set(costs) == {1, 2}
    assert all(c > 0 for c in costs.values())
    # selection stays inside the artifact's buckets
    assert eng._effective_bucket(1, SRC_PICK) in (1, 2)


def test_tiling_export_includes_input_hw_and_serves(tmp_path):
    # tiled serving runs the INPUT-sized step on tile crops: export must
    # carry those programs and warmup must pre-compile them
    cfg = _det_cfg("missing_yolov8n.pt", tiling=True, tiling_overlap=0.2)
    live = JaxYoloEngine(cfg)
    path = str(tmp_path / "tiled.rvae")
    meta = export_serving_artifact(live, path, src_hws=[(192, 192)])
    srcs = {(p["src_h"], p["src_w"]) for p in meta["programs"]}
    assert (INPUT, INPUT) in srcs  # tile programs present

    served = ExportedYoloEngine(
        _det_cfg(path, tiling=True, tiling_overlap=0.2)
    )
    served.warmup((192, 192))
    # warmup recursed into input_hw (cost entries exist for the tile step)
    assert (INPUT, INPUT) in served._bucket_cost_ms
    frames = np.random.default_rng(2).integers(
        0, 256, (1, 192, 192, 3), np.uint8
    )
    a = live.predict_arrays(frames.copy())
    b = served.predict_arrays(frames.copy())
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)


def test_empty_src_hws_rejected(live_engine, tmp_path):
    with pytest.raises(ValueError, match="at least one source resolution"):
        export_serving_artifact(
            live_engine, str(tmp_path / "e.rvae"), src_hws=[]
        )


def test_failed_export_leaves_no_artifact(live_engine, tmp_path,
                                          monkeypatch):
    # a program that fails to export must not leave a partial zip behind
    path = str(tmp_path / "broken.rvae")
    import realtime_analytics_tpu.engine.export as export_mod

    def boom(*a, **k):
        raise RuntimeError("unexportable op")

    monkeypatch.setattr(export_mod.jax.export, "export", boom)
    with pytest.raises(RuntimeError, match="unexportable"):
        export_serving_artifact(live_engine, path, src_hws=[SRC_PICK])
    assert not os.path.exists(path)


def test_mesh_config_rejected_at_serve(artifact):
    path, _ = artifact
    with pytest.raises(ConfigError, match="single-device at export time"):
        ExportedYoloEngine(_det_cfg(path, mesh_shape=[2, 1]))


def test_baked_knob_drift_warns(artifact, caplog):
    import logging

    path, _ = artifact
    with caplog.at_level(logging.WARNING):
        ExportedYoloEngine(_det_cfg(path, classes=[0, 2]))
    assert any("classes" in r.message and "baked-in" in r.message
               for r in caplog.records)


def test_platform_mismatch_rejected(artifact, tmp_path):
    path, _ = artifact
    victim = str(tmp_path / "wrongplat.rvae")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(victim, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "meta.json":
                meta = json.loads(data)
                meta["platforms"] = ["nonexistent-hw"]
                data = json.dumps(meta)
            zout.writestr(item, data)
    with pytest.raises(ConfigError, match="re-export on this platform"):
        ExportedYoloEngine(_det_cfg(victim))


def test_export_cli(tmp_path):
    from realtime_analytics_tpu.scripts.export_engine import main

    out = str(tmp_path / "cli.rvae")
    rc = main([
        "--model", "missing_yolov8n.pt",
        "--model-type", "yolov8",
        "--output", out,
        "--src", "192x192",
        "--input-size", "64x64",
        "--buckets", "1",
    ])
    assert rc == 0
    assert os.path.exists(out)
    with zipfile.ZipFile(out) as zf:
        meta = json.loads(zf.read("meta.json"))
    names = [p["name"] for p in meta["programs"]]
    assert len(names) == 1 and names[0].startswith("192x192_b1")
    assert meta["input_size"] == [64, 64]


def _packets(frames, name="cam"):
    from realtime_analytics_tpu.config import StreamConfig
    from realtime_analytics_tpu.types import FramePacket

    stream = StreamConfig(name=name, url="synthetic://", target_fps=25)
    return [
        FramePacket(stream, f, i, float(i)) for i, f in enumerate(frames)
    ]


def _dets_equal(a, b):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert da.class_id == db.class_id
        assert da.confidence == db.confidence
        assert da.bbox_xyxy == db.bbox_xyxy


def test_resnet_export_roundtrip(tmp_path):
    from realtime_analytics_tpu.engine.detector import JaxResNetEngine
    from realtime_analytics_tpu.engine.export import ExportedResNetEngine

    cfg = DetectorConfig(
        model_path="resnet18-missing.npz", model_type="resnet",
        input_size=[32, 32], resnet_num_classes=10,
        resnet_scores="softmax", confidence_threshold=1e-6,
        batch_buckets=[2], max_batch_size=2, warmup=False,
    )
    live = JaxResNetEngine(cfg)
    path = str(tmp_path / "resnet.rvae")
    meta = export_serving_artifact(live, path, src_hws=[(64, 96)])
    assert meta["engine"] == "resnet"

    served = create_detector(
        DetectorConfig(
            model_path=path, model_type="resnet", input_size=[32, 32],
            resnet_num_classes=10, resnet_scores="softmax",
            confidence_threshold=1e-6, warmup=False,
        )
    )
    assert isinstance(served, ExportedResNetEngine)
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (64, 96, 3), np.uint8) for _ in range(2)]
    a = live.predict_packets(_packets(frames))
    b = served.predict_packets(_packets(frames))
    for ra, rb in zip(a, b):
        assert len(ra) > 0  # top-k classifications actually emitted
        _dets_equal(ra, rb)


def test_temporal_export_roundtrip(tmp_path):
    from realtime_analytics_tpu.engine.export import ExportedTemporalEngine
    from realtime_analytics_tpu.engine.temporal import JaxTemporalEngine

    cfg = DetectorConfig(
        model_path="cnnlstm-missing.npz", model_type="cnn_lstm",
        input_size=[32, 32], sequence_length=4, sequence_stride=1,
        num_action_classes=8, confidence_threshold=1e-6,
        batch_buckets=[1], max_batch_size=1, warmup=False,
    )
    live = JaxTemporalEngine(cfg)
    path = str(tmp_path / "temporal.rvae")
    meta = export_serving_artifact(live, path, src_hws=[(32, 32)])
    assert meta["engine"] == "temporal"
    assert meta["sequence_length"] == 4

    served = create_detector(
        DetectorConfig(
            model_path=path, model_type="cnn_lstm", input_size=[32, 32],
            sequence_length=4, sequence_stride=1, num_action_classes=8,
            confidence_threshold=1e-6, warmup=False,
        )
    )
    assert isinstance(served, ExportedTemporalEngine)
    rng = np.random.default_rng(5)
    clip = _packets(
        [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(4)]
    )
    a = live.predict_clips([clip])
    b = served.predict_clips([clip])
    assert len(a) == len(b) == 1
    assert len(a[0]) > 0  # top-5 actions emitted
    for da, db in zip(a[0], b[0]):
        assert da.class_id == db.class_id
        assert da.confidence == db.confidence
        assert da.action_label == db.action_label


def test_rsz_programs_deduplicated(tmp_path):
    # 'rsz' steps take input_hw-shaped batches regardless of source
    # resolution: repeated --src values and multiple resized sources must
    # produce ONE serialized program per bucket, with index rows aliasing
    # it — not MBs of duplicate StableHLO
    import zipfile

    pytest.importorskip("cv2")
    from realtime_analytics_tpu.engine.detector import JaxResNetEngine

    cfg = DetectorConfig(
        model_path="resnet18-missing.npz", model_type="resnet",
        input_size=[32, 32], resnet_num_classes=10,
        resnet_scores="softmax", confidence_threshold=1e-6,
        batch_buckets=[2], max_batch_size=2, warmup=False,
        host_resize="on",
    )
    live = JaxResNetEngine(cfg)
    path = str(tmp_path / "dedup.rvae")
    # (64, 96) repeated + a second resized source; both map to the same
    # 32x32 'rsz' program at bucket 2
    meta = export_serving_artifact(
        live, path, src_hws=[(64, 96), (64, 96), (128, 128)]
    )
    rows = meta["programs"]
    assert all(r["kind"] == "rsz" for r in rows)
    assert len(rows) == 2  # deduped: (64,96) once + (128,128)
    assert len({r["name"] for r in rows}) == 1  # aliased to one program
    with zipfile.ZipFile(path) as zf:
        prog_entries = [n for n in zf.namelist() if n.startswith("programs/")]
    assert len(prog_entries) == 1

    served = create_detector(
        DetectorConfig(
            model_path=path, model_type="resnet", input_size=[32, 32],
            resnet_num_classes=10, resnet_scores="softmax",
            confidence_threshold=1e-6, warmup=False,
        )
    )
    rng = np.random.default_rng(7)
    for hw in [(64, 96), (128, 128)]:
        frames = [rng.integers(0, 256, (*hw, 3), np.uint8) for _ in range(2)]
        a = live.predict_packets(_packets(frames))
        b = served.predict_packets(_packets(frames))
        for ra, rb in zip(a, b):
            _dets_equal(ra, rb)


def test_int8_export_roundtrip(tmp_path):
    # int8 params mix int8 quantized weights with float scales — the
    # artifact must carry them all and serve bit-identically
    cfg = _det_cfg("missing_yolov8n.pt", precision="int8")
    live = JaxYoloEngine(cfg)
    path = str(tmp_path / "int8.rvae")
    meta = export_serving_artifact(live, path, src_hws=[SRC_PICK])
    assert meta["precision"] == "int8"
    served = ExportedYoloEngine(_det_cfg(path, precision="int8"))
    frames = np.random.default_rng(11).integers(
        0, 256, (2, *SRC_PICK, 3), np.uint8
    )
    a = live.predict_arrays(frames.copy())
    b = served.predict_arrays(frames.copy())
    np.testing.assert_array_equal(a.num_valid, b.num_valid)
    np.testing.assert_array_equal(a.boxes_xyxy, b.boxes_xyxy)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_export_cli_derives_src_from_config(tmp_path):
    from realtime_analytics_tpu.scripts.export_engine import main

    yaml_path = tmp_path / "p.yaml"
    yaml_path.write_text(
        """
streams:
  - name: a
    url: "synthetic://?width=128&height=96"
  - name: b
    url: "synthetic://?width=64&height=64"
detector:
  model_path: missing_yolov8n.pt
  model_type: yolov8
  input_size: [64, 64]
  batch_buckets: [1]
  max_batch_size: 1
  warmup: false
"""
    )
    out = str(tmp_path / "auto.rvae")
    rc = main(["--config", str(yaml_path), "--output", out])
    assert rc == 0
    with zipfile.ZipFile(out) as zf:
        meta = json.loads(zf.read("meta.json"))
    srcs = {(p["src_h"], p["src_w"]) for p in meta["programs"]}
    assert srcs == {(96, 128), (64, 64)}


def test_resnet_oversized_batch_raises(tmp_path):
    from realtime_analytics_tpu.engine.detector import JaxResNetEngine
    from realtime_analytics_tpu.engine.export import ExportedResNetEngine

    cfg = DetectorConfig(
        model_path="resnet18-missing.npz", model_type="resnet",
        input_size=[32, 32], resnet_num_classes=10,
        batch_buckets=[1], max_batch_size=1, warmup=False,
    )
    path = str(tmp_path / "r.rvae")
    export_serving_artifact(JaxResNetEngine(cfg), path, src_hws=[(32, 32)])
    served = ExportedResNetEngine(
        DetectorConfig(model_path=path, model_type="resnet",
                       input_size=[32, 32], resnet_num_classes=10,
                       warmup=False)
    )
    frames = [np.zeros((32, 32, 3), np.uint8)] * 2
    with pytest.raises(ValueError, match="largest exported bucket 1"):
        served.predict_packets(_packets(frames))


def test_warmup_host_drift_raises_config_error(artifact):
    # if the serve-time host path diverges from export time (e.g. cv2
    # gone), warmup must fail with the designed missing-program error,
    # never feed a wrong-shaped input into the exported program
    path, _ = artifact
    eng = ExportedYoloEngine(_det_cfg(path))
    orig = eng.host_prepare
    eng.host_prepare = lambda frames, src_hw: (frames, False)  # drifted
    try:
        with pytest.raises(ConfigError, match="no program for"):
            eng.warmup(SRC_PICK)
    finally:
        eng.host_prepare = orig


def test_exported_engine_enables_compile_cache(artifact, tmp_path):
    import jax

    path, _ = artifact
    cache = str(tmp_path / "cache")
    before = jax.config.jax_compilation_cache_dir
    try:
        ExportedYoloEngine(_det_cfg(path, compile_cache_dir=cache))
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_export_cli_named_detector(tmp_path):
    from realtime_analytics_tpu.scripts.export_engine import main

    yaml_path = tmp_path / "p.yaml"
    yaml_path.write_text(
        """
streams:
  - name: a
    url: "synthetic://?width=128&height=96"
    detector_id: small
detector:
  model_path: ignored_yolov8n.pt
detectors:
  small:
    model_path: missing_yolov8n.pt
    model_type: yolov8
    input_size: [64, 64]
    batch_buckets: [1]
    max_batch_size: 1
    warmup: false
"""
    )
    out = str(tmp_path / "named.rvae")
    rc = main(["--config", str(yaml_path), "--detector-id", "small",
               "--output", out])
    assert rc == 0
    with zipfile.ZipFile(out) as zf:
        meta = json.loads(zf.read("meta.json"))
    assert meta["input_size"] == [64, 64]
    assert {(p["src_h"], p["src_w"]) for p in meta["programs"]} == {(96, 128)}
    # unknown id fails with the available list
    rc = main(["--config", str(yaml_path), "--detector-id", "nope",
               "--output", str(tmp_path / "x.rvae")])
    assert rc == 2


def test_mesh_engine_refuses_export(live_engine, tmp_path):
    class FakeMesh:  # engine.mesh is truthy -> must refuse
        pass

    mesh, live_engine.mesh = live_engine.mesh, FakeMesh()
    try:
        with pytest.raises(ValueError, match="single-device"):
            export_serving_artifact(
                live_engine, str(tmp_path / "x.rvae"), src_hws=[SRC_PICK]
            )
    finally:
        live_engine.mesh = mesh


def test_graph_backed_export_roundtrip(tmp_path):
    """A foreign-architecture ONNX served through the generic graph path
    must export to .rvae and reload bit-identically — its raw ONNX
    initializer names ('/model.22/...'-style after torch constant folding)
    ride the escaped flatten keys, and the reloaded engine serves fp32
    regardless of the artifact's precision field (the foreign-graph
    numerics contract)."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch

    from test_onnx_graph_serving import HW, NC, ForeignDetector, _export

    torch.manual_seed(100)
    m = ForeignDetector(bake_batch=False).eval()
    onnx_path = str(tmp_path / "foreign.onnx")
    _export(m, torch.rand(1, 3, *HW), onnx_path,
            dynamic_axes={"x": {0: "n"}})

    live = JaxYoloEngine(DetectorConfig(
        model_path=onnx_path, model_type="yolov8", backend="onnx",
        confidence_threshold=0.3, iou_threshold=0.45, input_size=list(HW),
        batch_buckets=[2], max_batch_size=2, num_classes=NC, warmup=False,
    ))
    assert getattr(live.model, "graph_backed", False)

    path = str(tmp_path / "foreign.rvae")
    meta = export_serving_artifact(live, path, src_hws=[HW])
    assert meta["graph_backed"] is True

    served = create_detector(DetectorConfig(
        model_path=path, model_type="yolov8", input_size=list(HW),
        confidence_threshold=0.3, iou_threshold=0.45, num_classes=NC,
        warmup=False,
    ))
    assert isinstance(served, ExportedYoloEngine)
    assert served.compute_dtype == jnp.float32
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (*HW, 3), np.uint8) for _ in range(2)]
    a = live.predict_packets(_packets(frames))
    b = served.predict_packets(_packets(frames))
    assert sum(len(r) for r in a) > 0
    for ra, rb in zip(a, b):
        _dets_equal(ra, rb)


def test_graph_backed_resnet_export_meta(tmp_path):
    """Only the YOLO engine caches ``_graph_backed``; ResNet/temporal
    engines carry the flag on their model. The artifact meta must record
    graph_backed=True for them too, or the reloaded engine re-applies the
    bf16 cast the live engine explicitly skipped (foreign-graph fp32
    contract)."""
    import sys

    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_onnx_graph_serving import ForeignClassifier, _export

    from realtime_analytics_tpu.engine.detector import JaxResNetEngine

    torch.manual_seed(11)
    m = ForeignClassifier().eval()
    onnx_path = str(tmp_path / "fcls.onnx")
    _export(m, torch.rand(1, 3, 48, 48), onnx_path,
            dynamic_axes={"x": {0: "n"}})
    live = JaxResNetEngine(DetectorConfig(
        model_path=onnx_path, model_type="resnet", backend="onnx",
        input_size=[48, 48], num_classes=9, warmup=False,
        precision="bf16",  # the engine must override to fp32 AND record it
        max_batch_size=2, batch_buckets=[2],
        confidence_threshold=0.001, resnet_scores="softmax",
    ))
    assert getattr(live.model, "graph_backed", False)
    assert live.compute_dtype == jnp.float32

    meta = export_serving_artifact(
        live, str(tmp_path / "fcls.rvae"), src_hws=[(48, 48)]
    )
    assert meta["graph_backed"] is True

    served = create_detector(DetectorConfig(
        model_path=str(tmp_path / "fcls.rvae"), model_type="resnet",
        input_size=[48, 48], num_classes=9, warmup=False,
        confidence_threshold=0.001, resnet_scores="softmax",
    ))
    assert served.compute_dtype == jnp.float32


def test_compile_cache_auto_default_and_off(tmp_path, monkeypatch):
    """compile_cache_dir defaults to 'auto' (persistent cache under the
    user cache dir — restarts skip first-compile, README deploy note);
    'off' disables."""
    import jax

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import (
        _maybe_enable_compile_cache,
    )

    monkeypatch.setenv("HOME", str(tmp_path))
    before = jax.config.jax_compilation_cache_dir
    try:
        cfg = DetectorConfig(model_path="x.pt")
        assert cfg.compile_cache_dir == "auto"
        _maybe_enable_compile_cache(cfg)
        expected = str(
            tmp_path / ".cache" / "realtime-analytics-tpu" / "xla"
        )
        assert jax.config.jax_compilation_cache_dir == expected
        assert os.path.isdir(expected)

        jax.config.update("jax_compilation_cache_dir", None)
        _maybe_enable_compile_cache(
            DetectorConfig(model_path="x.pt", compile_cache_dir="off")
        )
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
