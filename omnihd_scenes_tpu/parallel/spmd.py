"""Multi-axis SPMD: tensor parallelism on top of data parallelism.

The reference has no model parallelism (DDP only).  On TPU the natural
formulation is a 2-D ``Mesh(('data', 'model'))`` with GSPMD doing the
partitioning: the batch is sharded over ``data`` (gradient psum over
ICI, as in 1-D dp) and parameters are sharded over ``model`` by a
shape rule — output-channel / output-feature parallelism for conv and
dense kernels.  XLA GSPMD inserts the collectives (all-gather of
activations, reduce-scatter of channel partials) and the arithmetic is
exactly the unsharded computation (verified in
``tests/test_parallel.py::test_tp_dp_matches_single_device``).

The rule is deliberately structural, not name-based: any kernel whose
LAST axis is divisible by the ``model`` axis size (and wide enough to
be worth splitting) is sharded on that axis; biases, BN vectors and
small heads stay replicated.  For conv models this is channel-wise TP;
for transformer blocks it is the classic Megatron column split of
QKV/FFN-up (the row-split of the following projection is left to
GSPMD's resharding, which costs one all-gather — simple and correct
over fast ICI).

Memory: optimizer moments follow the same rule (same shapes), so
parameter+optimizer memory per chip shrinks by ~the model-axis size
for the sharded tensors.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec(leaf, model_size: int, axis: str = 'model') -> P:
    """Partition rule: shard the last (output) axis of >=2-D kernels."""
    shape = getattr(leaf, 'shape', ())
    if (len(shape) >= 2 and shape[-1] % model_size == 0
            and shape[-1] >= 2 * model_size):
        return P(*([None] * (len(shape) - 1)), axis)
    return P()


def shard_tree_tp(tree, mesh: Mesh, axis: str = 'model'):
    """Device-put a pytree with the tp rule applied per leaf."""
    size = mesh.shape[axis]
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, tp_spec(x, size, axis))), tree)


def shard_state_tp_dp(state, batch, mesh: Mesh, *, data_axis: str = 'data',
                      model_axis: str = 'model'):
    """Shard a TrainState + batch for a 2-D (data x model) mesh.

    Params / optimizer moments / batch_stats follow the tp shape rule;
    the batch is sharded on its leading (batch) dimension over the data
    axis.  Returns (state, batch) as sharded device arrays.
    """
    state = type(state)(*(shard_tree_tp(x, mesh, model_axis)
                          for x in state))
    bspec = NamedSharding(mesh, P(data_axis))
    batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
    return state, batch


def make_tp_dp_mesh(n_devices: int = None, model: int = 2,
                    devices=None) -> Mesh:
    """2-D mesh: model axis innermost (adjacent devices = fastest ICI)."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model == 0, (n, model)
    dev_array = np.asarray(devices).reshape(n // model, model)
    return Mesh(dev_array, ('data', 'model'))
