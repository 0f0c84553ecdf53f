"""AOT model export for deployment (the TRT-engine analogue).

The reference ecosystem deploys through TensorRT engines (ONNX export
+ TRT symbolics, e.g. ``ops/bev_pool_v2/bev_pool.py:94-130``).  The
TPU-native counterpart is :mod:`jax.export`: the jitted inference
function is lowered to a serialized StableHLO artifact with
compatibility guarantees, loadable and executable without any model
code — only the artifact, the weights and jax itself.

An exported bundle is a directory:

    exported.stablehlo   serialized jax.export artifact (params are an
                         input, so the artifact is small and the same
                         artifact serves retrained weights)
    params.msgpack       flax-serialized {params, batch_stats} trees
    meta.json            model type, input shapes/dtypes, precision,
                         jax version

Precision: ``bf16=True`` (default) exports the deployment-precision
graph — params/stats/inputs cast to bfloat16, decode in f32 — matching
``bench.py``'s measured configuration.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


class ExportedModel:
    """A loaded export bundle: ``__call__(**inputs)`` runs inference."""

    def __init__(self, exported, variables, meta: Dict[str, Any]):
        self._exported = exported
        self._variables = variables
        self.meta = meta

    @property
    def input_specs(self) -> Dict[str, Any]:
        return self.meta['inputs']

    def __call__(self, *inputs):
        return self._exported.call(self._variables['params'],
                                   self._variables.get('batch_stats', {}),
                                   *inputs)


def _to_bf16(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == np.float32 else x, tree)


def export_model(model, mtype: str, variables, example_inputs,
                 out_dir: str, *, anchors_np: Optional[np.ndarray] = None,
                 bf16: bool = True, platforms=None) -> str:
    """Export a model's inference function as a deployable bundle.

    Args:
        model: the flax module (any anchor-family detector; BEVFormer
            streaming export uses its ``forward_stream`` signature).
        mtype: model family name as in ``train.builder``.
        variables: trained ``{'params': ..., 'batch_stats': ...}``.
        example_inputs: positional batch inputs defining shapes/dtypes
            (a dict batch from the loaders also works — it is converted
            through ``train.builder._model_inputs``).
        out_dir: bundle directory (created).
        anchors_np: dense anchors for anchor-head decode.
        bf16: export the bf16 deployment-precision graph.
        platforms: lowering platforms, e.g. ``['tpu']`` or
            ``['tpu', 'cpu']``; defaults to the current backend.
    Returns out_dir.
    """
    import jax
    from flax import serialization
    from jax import export as jax_export

    from omnihd_scenes_tpu.models.anchor_head import (
        DecodeCfg, anchor_head_get_bboxes)
    from omnihd_scenes_tpu.train.builder import _model_inputs

    if isinstance(example_inputs, dict):
        # _model_inputs returns a kwarg dict; order it by the model's
        # positional __call__ signature.
        import inspect

        kw = _model_inputs(example_inputs, mtype, False)
        order = [p for p in inspect.signature(
            type(model).__call__).parameters
            if p in kw]
        assert set(order) == set(kw), (order, sorted(kw))
        example_inputs = tuple(kw[k] for k in order)
    example_inputs = tuple(example_inputs)

    variables = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    if bf16:
        variables = _to_bf16(variables)
        example_inputs = tuple(_to_bf16(x) for x in example_inputs)

    decode_cfg = DecodeCfg()
    anchors = None if anchors_np is None else np.asarray(anchors_np)

    def infer(params, batch_stats, *inputs):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          *inputs, train=False)
        if anchors is None:
            return out
        b = inputs[0].shape[0]
        anchors_b = jnp.broadcast_to(jnp.asarray(anchors)[None],
                                     (b,) + anchors.shape)
        import functools

        dets = jax.vmap(functools.partial(anchor_head_get_bboxes,
                                          cfg=decode_cfg))(
            out['cls_score'].astype(jnp.float32),
            out['bbox_pred'].astype(jnp.float32),
            out['dir_pred'].astype(jnp.float32),
            anchors_b.astype(jnp.float32))
        if isinstance(out, dict) and 'occ_logits' in out:
            # MTL: ship the occupancy prediction alongside detections,
            # matching the live predict path (train/builder.py).
            return dets + (jnp.argmax(out['occ_logits'], axis=-1),)
        return dets

    import jax.numpy as jnp

    args = (variables['params'], variables['batch_stats'],
            *example_inputs)
    arg_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exported = jax_export.export(jax.jit(infer), **kwargs)(*arg_specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'exported.stablehlo'), 'wb') as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, 'params.msgpack'), 'wb') as f:
        f.write(serialization.to_bytes(variables))
    meta = {
        'mtype': mtype,
        'bf16': bool(bf16),
        'jax_version': jax.__version__,
        'platforms': list(exported.platforms),
        'inputs': [{'shape': list(np.shape(x)), 'dtype': str(x.dtype)}
                   for x in example_inputs],
        'decode': None if anchors is None else {
            'nms_pre': decode_cfg.nms_pre, 'max_num': decode_cfg.max_num},
    }
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_exported(bundle_dir: str) -> ExportedModel:
    """Load a bundle exported by :func:`export_model`.

    Needs no model code: the StableHLO artifact plus the weight trees
    fully define inference.
    """
    from flax import serialization
    from jax import export as jax_export

    with open(os.path.join(bundle_dir, 'exported.stablehlo'), 'rb') as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(bundle_dir, 'meta.json')) as f:
        meta = json.load(f)
    with open(os.path.join(bundle_dir, 'params.msgpack'), 'rb') as f:
        variables = serialization.msgpack_restore(f.read())
    return ExportedModel(exported, variables, meta)
