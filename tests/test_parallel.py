"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.models.yolo import build_yolo
from realtime_analytics_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)
from realtime_analytics_tpu.parallel.train import (
    anchor_centers,
    make_train_step,
    synthetic_targets,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force an 8-device CPU mesh"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}


def test_param_shardings_channel_rule(mesh):
    model = build_yolo("yolov8", "n", nc=16)
    params = model.init_params(jax.random.PRNGKey(0))
    shardings = param_shardings(params, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    param_leaves = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params)
    }
    n_sharded = 0
    for path, sharding in leaves:
        arr = param_leaves[jax.tree_util.keystr(path)]
        spec = sharding.spec
        if arr.shape and arr.shape[-1] % 2 == 0:
            assert spec[-1] == "tp", f"{path} should be channel-sharded"
            n_sharded += 1
        elif spec:
            assert spec[-1] is None
    assert n_sharded > 50  # most conv kernels are sharded


def test_anchor_centers_layout():
    a = anchor_centers((64, 64))
    assert a.shape == ((8 * 8) + (4 * 4) + (2 * 2), 2)
    np.testing.assert_allclose(a[0], [4.0, 4.0])  # first P3 cell center
    np.testing.assert_allclose(a[64], [8.0, 8.0])  # first P4 cell center


def test_sharded_train_step_decreases_loss(mesh):
    model = build_yolo("yolov8", "n", nc=8)
    input_hw = (64, 64)
    init_fn, step_fn = make_train_step(model, mesh, input_hw, learning_rate=5e-3)
    rng = np.random.default_rng(0)
    batch = 8
    images = jnp.asarray(rng.uniform(0, 1, (batch, *input_hw, 3)).astype(np.float32))
    targets = {
        k: jnp.asarray(v)
        for k, v in synthetic_targets(rng, batch, 4, input_hw, 8).items()
    }
    with mesh:
        state = init_fn(jax.random.PRNGKey(0))
        losses = []
        for _ in range(5):
            state, loss = step_fn(state, images, targets)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # params actually sharded over the mesh
    some_leaf = state.params["layers"]["1"]["w"]
    assert len(some_leaf.sharding.device_set) > 1


@pytest.fixture(scope="module")
def mesh3():
    """The 3-axis (dp, sp, tp) mesh the driver's dryrun takes at n=8."""
    return make_mesh(8, axis_names=("dp", "sp", "tp"))


def test_mesh3_shape(mesh3):
    assert dict(mesh3.shape) == {"dp": 2, "sp": 2, "tp": 2}


def test_make_mesh_insufficient_devices_is_actionable():
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(16)


def test_sharded_train_step_3axis_sp_halo(mesh3):
    """Train step on the (dp, sp, tp) mesh: images shard over batch AND
    image height, so GSPMD must insert conv halo exchanges over sp."""
    model = build_yolo("yolov8", "n", nc=8)
    input_hw = (64, 64)
    init_fn, step_fn = make_train_step(model, mesh3, input_hw, learning_rate=5e-3)
    rng = np.random.default_rng(0)
    batch = 4
    images = jnp.asarray(rng.uniform(0, 1, (batch, *input_hw, 3)).astype(np.float32))
    targets = {
        k: jnp.asarray(v)
        for k, v in synthetic_targets(rng, batch, 4, input_hw, 8).items()
    }
    with mesh3:
        state = init_fn(jax.random.PRNGKey(0))
        losses = []
        for _ in range(3):
            state, loss = step_fn(state, images, targets)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_sharded_inference_3axis_matches_single_device(mesh3):
    """dp+sp-sharded fused inference must equal the unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=4, batch_buckets=[4],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
    )
    eng = JaxYoloEngine(cfg)
    frames = np.random.default_rng(1).integers(
        0, 256, (4, 96, 128, 3), dtype=np.uint8
    )
    step = eng._get_step(4, (96, 128))
    ref = jax.device_get(step(eng.params, jnp.asarray(frames)))

    sharded_params = shard_params(eng.params, mesh3)
    with mesh3:
        fsh = jax.device_put(
            frames, NamedSharding(mesh3, P("dp", "sp", None, None))
        )
        got = jax.device_get(step(sharded_params, fsh))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, rtol=1e-4, atol=1e-3)


def test_sharded_inference_matches_single_device(mesh):
    """dp-sharded fused inference must equal the unsharded result."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    cfg = DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8, batch_buckets=[8],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
    )
    eng = JaxYoloEngine(cfg)
    frames = np.random.default_rng(1).integers(
        0, 256, (8, 96, 128, 3), dtype=np.uint8
    )
    step = eng._get_step(8, (96, 128))
    ref = jax.device_get(step(eng.params, jnp.asarray(frames)))

    sharded_params = shard_params(eng.params, mesh)
    with mesh:
        fsh = jax.device_put(frames, batch_sharding(mesh, 4))
        got = jax.device_get(step(sharded_params, fsh))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, rtol=1e-4, atol=1e-3)


def test_engine_mesh_shape_config_is_wired(mesh):
    """detector.mesh_shape must actually shard the serving engine (it was a
    dead key in round 2 until wired): results equal the unsharded engine."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    base = dict(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8, batch_buckets=[8],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
        host_select="off",
    )
    plain = JaxYoloEngine(DetectorConfig(**base))
    sharded = JaxYoloEngine(DetectorConfig(mesh_shape=[4, 2], **base),
                            params=jax.device_get(plain.params))
    assert sharded.mesh is not None
    assert len(jax.tree_util.tree_leaves(sharded.params)[5].sharding.device_set) > 1

    frames = np.random.default_rng(2).integers(
        0, 256, (8, 96, 128, 3), dtype=np.uint8
    )
    ref = plain.predict_arrays(frames)
    got = sharded.predict_arrays(frames)
    np.testing.assert_array_equal(got.num_valid, ref.num_valid)
    np.testing.assert_allclose(got.boxes_xyxy, ref.boxes_xyxy, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got.scores, ref.scores, rtol=1e-4, atol=1e-5)


def test_engine_mesh_small_batches_round_to_dp(mesh):
    """Mesh-mode buckets round up to a dp multiple — a single-frame predict
    must not crash on batch-dim divisibility (round-2 review finding)."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8,
        batch_buckets=[1, 2, 8],  # 1 and 2 are NOT divisible by dp=4
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
        host_select="off", mesh_shape=[4, 2],
    ))
    assert eng._effective_bucket(1, (96, 128)) == 4
    frames = np.random.default_rng(3).integers(
        0, 256, (1, 96, 128, 3), dtype=np.uint8
    )
    br = eng.predict_arrays(frames)  # crashed before the fix
    assert br.boxes_xyxy.shape[0] == 1


def test_engine_mesh_warmup_compiles_the_serving_executable(mesh):
    """Mesh-mode warmup must prime the same jit cache entry predict uses
    (sharded input layout) — otherwise the first live batch recompiles."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8, batch_buckets=[8],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
        host_select="off", mesh_shape=[4, 2],
    ))
    eng.warmup((96, 128))
    step = eng._steps[(8, 96, 128)]
    n_before = step._cache_size()
    frames = np.random.default_rng(3).integers(
        0, 256, (8, 96, 128, 3), dtype=np.uint8
    )
    eng.predict_arrays(frames)
    assert step._cache_size() == n_before, (
        "predict compiled a second executable after warmup"
    )


def test_engine_mesh_keeps_pallas_gather(mesh):
    """Under a mesh the NMS payload gather must stay on the Pallas MXU
    kernel (shard_map'd over dp — each chip gathers its local batch shard)
    instead of falling back to XLA's element-serial gather, with identical
    results. Round-2 disabled pallas under pjit; shard_map restores it."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    base = dict(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8, batch_buckets=[8],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
        host_select="off", mesh_shape=[4, 2],
    )
    xla = JaxYoloEngine(DetectorConfig(pallas_gather="off", **base))
    pal = JaxYoloEngine(DetectorConfig(pallas_gather="on", **base),
                        params=jax.device_get(xla.params))
    assert pal.mesh is not None
    assert pal._nms_gather_impl() == "pallas_interpret"  # CPU mesh -> interp

    frames = np.random.default_rng(5).integers(
        0, 256, (8, 96, 128, 3), dtype=np.uint8
    )
    ref = xla.predict_arrays(frames)
    got = pal.predict_arrays(frames)
    assert int(ref.num_valid.sum()) > 0
    np.testing.assert_array_equal(got.num_valid, ref.num_valid)
    np.testing.assert_array_equal(got.class_ids, ref.class_ids)
    np.testing.assert_allclose(got.boxes_xyxy, ref.boxes_xyxy,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got.scores, ref.scores, rtol=1e-5, atol=1e-6)


def test_engine_mesh_pallas_letterbox_shard_mapped(mesh):
    """The Mosaic letterbox grid is batch-parallel; under a mesh it must be
    shard_map'd over dp (round 2 would have handed pjit an unpartitioned
    pallas_call on fractional-ratio sources). Results equal the XLA path."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    base = dict(
        model_path="__random__.pt", input_size=[64, 64],
        confidence_threshold=0.01, max_batch_size=8, batch_buckets=[8],
        precision="fp32", warmup=False, pre_nms_topk=64, max_detections=16,
        host_select="off", host_resize="off", mesh_shape=[4, 2],
    )
    xla = JaxYoloEngine(DetectorConfig(pallas_preprocess="off", **base))
    pal = JaxYoloEngine(DetectorConfig(pallas_preprocess="on", **base),
                        params=jax.device_get(xla.params))
    # 100x150 -> 64x64 is a fractional ratio: the resize path, not a pick
    frames = np.random.default_rng(6).integers(
        0, 256, (8, 100, 150, 3), dtype=np.uint8
    )
    ref = xla.predict_arrays(frames)
    got = pal.predict_arrays(frames)
    assert int(ref.num_valid.sum()) > 0
    np.testing.assert_array_equal(got.num_valid, ref.num_valid)
    # bilinear taps differ in accumulation order between the two kernels
    np.testing.assert_allclose(got.boxes_xyxy, ref.boxes_xyxy,
                               rtol=1e-2, atol=1.0)
    np.testing.assert_allclose(got.scores, ref.scores, rtol=5e-2, atol=5e-3)


def test_v5_anchors_replicated_not_sharded(mesh):
    # the v5 'anchors' buffer's last dim is a (w,h) coordinate pair, not
    # channels — sharding it over tp would force GSPMD collectives around
    # every anchor read
    model = build_yolo("yolov5", "n", nc=16)
    params = model.init_params(jax.random.PRNGKey(0))
    shardings = param_shardings(params, mesh)
    for path, sharding in jax.tree_util.tree_leaves_with_path(shardings):
        if "anchors" in jax.tree_util.keystr(path):
            from jax.sharding import PartitionSpec as P

            assert sharding.spec == P(), "anchors must be replicated"
            break
    else:
        raise AssertionError("no anchors leaf found")


def test_make_train_step_rejects_v5():
    model = build_yolo("yolov5", "n", nc=16)
    with pytest.raises(ValueError, match="yolov8"):
        make_train_step(model, make_mesh(1), (64, 64))
