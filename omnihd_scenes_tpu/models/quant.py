"""Post-training int8 quantization for conv layers (deployment tier).

TPU v5e executes int8 matmuls/convs at 2x the bf16 rate (394 vs 197
TOPS); measured on the production conv shape (3x3, 256ch, 6x136x240)
an s8xs8->s32 conv runs 1.47x faster than bf16.  This module provides
the TPU analogue of the TensorRT int8 deployment path the reference
ecosystem uses (the reference ships TRT symbolics for bev_pool_v2,
``ops/bev_pool_v2/bev_pool.py:94-130``).

Scheme: symmetric PTQ, no zero points.
  * activations: per-tensor scale ``sx = amax / 127`` where ``amax`` is
    collected by running representative batches in ``calib`` mode (the
    running max lives in the ``quant`` variable collection);
  * weights: per-output-channel scale ``sw[c] = max|W[..., c]| / 127``,
    computed from the (already trained) parameters at trace time;
  * ``y = conv_s8(x8, w8) * (sx * sw) + bias`` accumulated in int32,
    rescaled to the activation dtype.

Usage:
    quant.set_mode('calib')
    _, muts = model.apply(variables, *batch, train=False,
                          mutable=['quant'])
    variables = {**variables, 'quant': muts['quant']}
    quant.set_mode('freeze')          # optional but recommended:
    _, muts = model.apply(variables, *batch, train=False,
                          mutable=['quant'])   # materialize int8 weights
    variables = {**variables, 'quant': muts['quant']}
    quant.set_mode('int8')
    out = model.apply(variables, *batch, train=False)

The mode is a process-global trace-time switch (it selects which graph
is built; jit caches are keyed by the traced graph, so switch modes
outside jit).  In the default ``off`` mode :class:`Conv` is numerically
identical to ``flax.linen.Conv`` and creates no ``quant`` variables —
checkpoints, module paths (``Conv_0/kernel``) and the torch importer
are unaffected.

Heads and logits layers stay unquantized by construction: only the
conv-heavy trunks route through :class:`Conv` (see call sites in
``layers.ConvBNReLU``, ``resnet.py``, ``fpnc.py``, ``lss.ASPP``).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

_MODE = 'off'          # 'off' | 'calib' | 'freeze' | 'int8'
_VALID = ('off', 'calib', 'freeze', 'int8')


def set_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f'quant mode {mode!r} not in {_VALID}')
    _MODE = mode


def get_mode() -> str:
    return _MODE


class Conv(nn.Conv):
    """``nn.Conv`` with an int8 post-training-quantization path.

    In ``off`` mode this IS ``nn.Conv`` (the parent ``__call__`` runs).
    flax derives scope names from the class name, so ``Conv_0`` param
    paths match ``nn.Conv`` and existing checkpoints load unchanged.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = get_mode()
        if mode == 'off':
            return super().__call__(x)

        if mode == 'calib':
            y = super().__call__(x)
            amax = self.variable('quant', 'act_amax',
                                 lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(
                amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            return y

        # --- freeze / int8 ---
        if not self.has_variable('quant', 'act_amax'):
            # Not calibrated (e.g. a module added after calibration):
            # stay in the float path rather than emitting garbage.
            return super().__call__(x)
        amax = self.get_variable('quant', 'act_amax')

        if mode == 'freeze':
            # Materialize int8 weights + per-channel scales into the
            # quant collection so the deployment graph reads them as
            # stored arrays (no in-graph requantization, int8 param
            # HBM traffic).  The float path declares the params.
            y = super().__call__(x)
            kf = self.get_variable('params', 'kernel').astype(jnp.float32)
            sw_f = jnp.maximum(
                jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)))
                / 127.0, 1e-12)
            w8_f = jnp.clip(jnp.round(kf / sw_f), -127, 127).astype(jnp.int8)
            self.variable('quant', 'w8', lambda: w8_f).value = w8_f
            self.variable('quant', 'w_scale', lambda: sw_f).value = sw_f
            return y

        kernel_size = tuple(self.kernel_size) if not isinstance(
            self.kernel_size, int) else (self.kernel_size,)
        in_features = x.shape[-1]
        kernel_shape = kernel_size + (
            in_features // self.feature_group_count, self.features)
        kernel = self.param('kernel', self.kernel_init, kernel_shape,
                            self.param_dtype)
        bias = (self.param('bias', self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)

        # nn.Conv treats extra leading dims as batch: flatten them for
        # the lax conv and restore after (DepthNet passes (B,N,H,W,C)).
        num_spatial = len(kernel_size)
        lead_shape = x.shape[:x.ndim - num_spatial - 1]
        if len(lead_shape) != 1:
            x = x.reshape((-1,) + x.shape[x.ndim - num_spatial - 1:])

        sx = jnp.maximum(amax, 1e-6).astype(jnp.float32) / 127.0
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        if self.has_variable('quant', 'w8'):
            w8 = self.get_variable('quant', 'w8')
            sw = self.get_variable('quant', 'w_scale')
        else:
            kf = kernel.astype(jnp.float32)
            sw = jnp.max(jnp.abs(kf),
                         axis=tuple(range(kf.ndim - 1))) / 127.0
            sw = jnp.maximum(sw, 1e-12)
            w8 = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)

        strides = tuple(self.strides) if not isinstance(
            self.strides, int) else (self.strides,) * len(kernel_size)
        dilation = self.kernel_dilation
        if dilation is None:
            dilation = (1,) * len(kernel_size)
        elif isinstance(dilation, int):
            dilation = (dilation,) * len(kernel_size)
        padding: Union[str, Sequence[Tuple[int, int]]] = self.padding

        import jax.lax as lax
        spatial = ''.join('HWD'[:num_spatial])
        dn = lax.conv_dimension_numbers(
            x8.shape, w8.shape,
            (f'N{spatial}C', f'{spatial}IO', f'N{spatial}C'))
        y32 = lax.conv_general_dilated(
            x8, w8, strides, padding, rhs_dilation=tuple(dilation),
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (sx * sw)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        if len(lead_shape) != 1:
            y = y.reshape(lead_shape + y.shape[1:])
        return y.astype(x.dtype)
