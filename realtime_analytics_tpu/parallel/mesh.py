"""Mesh construction and sharding rules.

Sharding policy for the YOLO/ResNet/temporal param pytrees:

  * conv kernels  [kh, kw, cin, cout] -> P(None, None, None, 'tp') when cout
    divides the tp axis, else replicated;
  * dense kernels [cin, cout]         -> P(None, 'tp') when divisible;
  * biases        [cout]              -> P('tp') when divisible;
  * activations                        -> batch axis over 'dp'.

XLA/GSPMD propagates these through the graph and inserts the collectives
(all-gathers at channel-concat points, psums in the backward pass) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
) -> Mesh:
    """Build a (dp, tp) — or (dp, sp, tp) — mesh over the available devices.

    With three axis names, the extra middle axis is spatial/sequence
    parallelism: activations shard over image height (or clip time) and
    GSPMD inserts the conv halo exchanges.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"requested a {n}-device mesh but jax.devices() has only "
            f"{len(devices)} ({devices[0].platform}). For a virtual multi-"
            "device run, set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} before jax "
            "initializes (see tests/conftest.py), or call "
            "__graft_entry__._ensure_devices(n)."
        )
    devices = devices[:n]
    if shape is None:
        sizes = []
        rem = n
        for _ in range(len(axis_names) - 1, 0, -1):
            f = 2 if rem % 2 == 0 and rem >= 2 else 1
            sizes.append(f)
            rem //= f
        shape = (rem, *reversed(sizes))
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {tuple(shape)} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def _leaf_spec(leaf: jax.Array, tp_size: int, path: str = "") -> P:
    """Channel-shard weight-like leaves over tp; replicate the rest.

    'Weight-like' = channel dim last: conv [kh,kw,cin,cout], dense
    [cin,cout], int8 w_q, and 1-D per-channel biases/scales (sharding
    those keeps them aligned with the sharded conv outputs). The v5
    'anchors' buffer [3,3,2] is excluded by path — its last dim is a
    (w,h) coordinate pair, not channels, and sharding a 72-byte buffer
    just forces GSPMD collectives around every anchor read."""
    shape = leaf.shape
    if len(shape) == 0 or "anchors" in path:
        return P()
    cout = shape[-1]
    if tp_size > 1 and cout % tp_size == 0 and cout >= tp_size:
        return P(*([None] * (len(shape) - 1)), "tp")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params pytree (channel-sharded over tp)."""
    tp_size = mesh.shape.get("tp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _leaf_spec(leaf, tp_size, jax.tree_util.keystr(path))
        ),
        params,
    )


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh with channel sharding."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
