"""Pallas fused letterbox kernel vs the cv2-semantics oracle.

Runs in interpreter mode on the CPU test mesh; the same kernel compiles via
Mosaic on TPU (exercised by bench/engine paths).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_analytics_tpu.ops.pallas_preprocess import (
    bilinear_matrix,
    pallas_letterbox,
)
from realtime_analytics_tpu.ops.preprocess import letterbox_numpy, letterbox_spec

INTERPRET = jax.default_backend() != "tpu"


def test_bilinear_matrix_rows_sum_to_one():
    for src, dst in [(540, 360), (1080, 640), (97, 128), (64, 64)]:
        A = bilinear_matrix(src, dst)
        np.testing.assert_allclose(A.sum(axis=1), 1.0, atol=1e-6)
        assert (A >= 0).all()
        # at most 2 taps per row
        assert (np.count_nonzero(A, axis=1) <= 2).all()


@pytest.mark.parametrize("src_hw", [(108, 192), (96, 96), (75, 131)])
def test_pallas_letterbox_matches_oracle(src_hw):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, *src_hw, 3), dtype=np.uint8)
    spec = letterbox_spec(src_hw, (128, 128))
    out = np.asarray(
        pallas_letterbox(
            jnp.asarray(frames), spec=spec, out_dtype=jnp.float32,
            interpret=INTERPRET,
        )
    )
    assert out.shape == (2, 128, 128, 3)
    for i in range(2):
        exp, _ = letterbox_numpy(frames[i], (128, 128))
        diff = np.abs(out[i] - exp[0].transpose(1, 2, 0))
        # bf16 interp weights: allow a couple of 8-bit steps
        assert diff.max() <= 3.01 / 255.0
        assert np.mean(diff > 1.01 / 255.0) < 0.02


def test_pallas_letterbox_pad_value():
    frames = np.zeros((1, 50, 128, 3), dtype=np.uint8)
    spec = letterbox_spec((50, 128), (128, 128))
    out = np.asarray(
        pallas_letterbox(
            jnp.asarray(frames), spec=spec, out_dtype=jnp.float32,
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(out[0, : spec.pad_top], 114.0 / 255.0, atol=1e-3)
    np.testing.assert_allclose(out[0, spec.pad_top + spec.new_h :], 114.0 / 255.0,
                               atol=1e-3)
