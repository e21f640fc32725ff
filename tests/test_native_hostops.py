"""Native host pixel-pick: equivalence with numpy, fallback behavior.

The C kernel (native/hostops.c, self-built + ctypes-loaded) feeds the chip
under host_select; it must match numpy's strided pick bit-for-bit across
geometries, handle both 3D and 4D inputs, and fall back cleanly when
disabled.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from realtime_analytics_tpu.native import native_available, pick_u8

GEOMETRIES = [
    (3, 1, 3, 1),   # the 1080p->640 flagship case
    (5, 2, 3, 1),   # mixed odd ratios
    (1, 0, 3, 1),   # identity H
    (7, 3, 7, 3),
]


@pytest.mark.parametrize("hr,hoff,wr,woff", GEOMETRIES)
@pytest.mark.parametrize("batch", [True, False])
def test_pick_matches_numpy(hr, hoff, wr, woff, batch):
    rng = np.random.default_rng(hr * 10 + wr)
    shape = (4, 210, 322, 3) if batch else (210, 322, 3)
    f = rng.integers(0, 256, shape, np.uint8)
    got = pick_u8(f, hr, hoff, wr, woff)
    want = np.ascontiguousarray(
        f[:, hoff::hr, woff::wr] if batch else f[hoff::hr, woff::wr]
    )
    np.testing.assert_array_equal(got, want)
    assert got.flags["C_CONTIGUOUS"]


def test_non_contiguous_input_falls_back():
    f = np.random.default_rng(0).integers(0, 256, (2, 96, 96, 3), np.uint8)
    view = f[:, ::2]  # non-contiguous
    got = pick_u8(view, 3, 1, 3, 1)
    want = np.ascontiguousarray(view[:, 1::3, 1::3])
    np.testing.assert_array_equal(got, want)


def test_rva_no_native_env_disables(tmp_path):
    """RVA_NO_NATIVE=1 must run pure numpy (still correct)."""
    code = (
        "import numpy as np\n"
        "from realtime_analytics_tpu.native import pick_u8, native_available\n"
        "assert not native_available()\n"
        "f = np.arange(2*30*30*3, dtype=np.uint8).reshape(2, 30, 30, 3)\n"
        "got = pick_u8(f, 3, 1, 3, 1)\n"
        "want = np.ascontiguousarray(f[:, 1::3, 1::3])\n"
        "np.testing.assert_array_equal(got, want)\n"
        "print('fallback-ok')\n"
    )
    env = dict(os.environ, RVA_NO_NATIVE="1")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "fallback-ok" in proc.stdout


def test_engine_uses_native_pick_and_matches():
    """host_prepare through the engine is identical with and without the
    native kernel (the selected-vs-full engine equivalence test covers the
    rest of the path)."""
    from realtime_analytics_tpu.config import DetectorConfig
    from realtime_analytics_tpu.engine.detector import JaxYoloEngine

    eng = JaxYoloEngine(DetectorConfig(
        model_path="__random__.pt", input_size=[64, 64], warmup=False,
        max_batch_size=2, batch_buckets=[2], precision="fp32",
    ))
    frames = np.random.default_rng(1).integers(
        0, 256, (2, 192, 192, 3), np.uint8
    )
    prepared, selected = eng.host_prepare(frames, (192, 192))
    assert selected
    np.testing.assert_array_equal(
        prepared, np.ascontiguousarray(frames[:, 1::3, 1::3])
    )


def test_native_actually_built_in_this_image():
    """The image ships cc; the native path must be live here (a regression
    to silent-fallback would hide a 4-6x host cost increase)."""
    assert native_available()
