"""Device mesh + sharding helpers.

The reference scales with DDP over NCCL (``apis/mmdet_train.py:76-80``);
here the same data parallelism is a 1-D ``Mesh(('data',))`` with the
batch dimension sharded via ``NamedSharding`` — XLA inserts the gradient
all-reduces.  Multi-axis meshes (data x model) are provisioned for the
transformer models.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one 'data' axis.  ``shape`` may use -1 for
    one axis to absorb the remaining device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data') -> dict:
    """Device-put a host batch with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


# ---------------------------------------------------------------------------
# Current-mesh registry (for modules that need an explicit mesh, e.g.
# the shard_map wrapper around the Pallas splat — pallas_call does not
# compose with GSPMD auto-partitioning, so the kernel region must be
# explicitly per-shard).  Mirrors the quant-mode global in
# models/quant.py: process-wide, set by the runner before tracing.
# ---------------------------------------------------------------------------

_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh for shard_map-wrapped kernel regions.
    Pass None to clear (single-device mode)."""
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Mesh:
    if _CURRENT_MESH is None:
        raise RuntimeError(
            'no current mesh: call parallel.mesh.set_current_mesh(mesh) '
            'before tracing a model configured with a shard_map axis '
            '(e.g. LSSConfig.splat_shard_axis)')
    return _CURRENT_MESH
