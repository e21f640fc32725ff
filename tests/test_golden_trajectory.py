"""Multi-frame golden TRAJECTORY gate (round-4 VERDICT item 6).

Re-runs every frame of the committed ``data/samples/demo.mp4`` through the
real ``InferenceBatcher`` -> ``JaxYoloEngine`` -> ``IouTracker`` chain as
two phase-shifted streams (the production topology) and compares the full
per-step track state — ids, classes, boxes, confidences, age, hits —
against the committed ``tests/data/golden_trajectory.json``.

What this catches that single-frame goldens cannot: per-stream frame
reordering in the batcher's deferral queue, tracker id-assignment /
association drift, lifecycle counter (age / hits / removal) regressions,
cross-stream state bleed. Track ids come from the tracker's shared
counter, so ANY association change anywhere in the chain cascades into an
id mismatch within a step or two.

Reference anchor: tracker lifecycle contract (reference tracker.py:50-126)
and per-stream sequential update order (reference pipeline.py:374-377).
"""

import importlib.util
import json
import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "data", "golden_trajectory.json")


def _mod(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_golden_trajectory_pinned():
    from realtime_analytics_tpu.models.onnx_lite import (
        write_onnx_initializers,
    )

    with open(GOLDEN) as f:
        want = json.load(f)

    gen = _mod("gen_golden_trajectory")
    fixture = _mod("gen_golden_fixture")
    with tempfile.TemporaryDirectory() as td:
        weights_onnx = os.path.join(td, "w.onnx")
        write_onnx_initializers(weights_onnx, fixture.synthetic_weights())
        engine = gen.build_trajectory_engine(weights_onnx)
        got = gen.run_trajectory(engine, gen.load_frames())

    assert got["n_steps"] == want["n_steps"]
    assert got["stream_b_offset"] == want["stream_b_offset"]
    for name in ("cam-a", "cam-b"):
        g_steps, w_steps = got["steps"][name], want["steps"][name]
        assert len(g_steps) == len(w_steps)
        for i, (g, w) in enumerate(zip(g_steps, w_steps)):
            ctx = f"{name} step {i}"
            assert [t["id"] for t in g] == [t["id"] for t in w], (
                f"{ctx}: track ids diverged — association/ordering "
                f"regression ({[t['id'] for t in g][:8]}... vs "
                f"{[t['id'] for t in w][:8]}...)"
            )
            assert [t["cls"] for t in g] == [t["cls"] for t in w], ctx
            assert [t["age"] for t in g] == [t["age"] for t in w], (
                f"{ctx}: lifecycle age counters diverged"
            )
            assert [t["hits"] for t in g] == [t["hits"] for t in w], (
                f"{ctx}: lifecycle hit counters diverged"
            )
            np.testing.assert_allclose(
                [t["conf"] for t in g], [t["conf"] for t in w],
                atol=6e-3, err_msg=f"{ctx}: confidences",
            )
            np.testing.assert_allclose(
                [t["box"] for t in g], [t["box"] for t in w],
                atol=0.75, err_msg=f"{ctx}: boxes",
            )
    # the fixture itself must exercise lifecycle churn, not a static scene
    assert want["total_track_ids"]["cam-a"] > 50, (
        "fixture has too little track churn to gate lifecycle"
    )
