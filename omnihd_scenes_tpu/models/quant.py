"""int8 quantization for conv layers (deployment tier + QAT).

This is the TPU analogue of the TensorRT int8 deployment path the
reference ecosystem uses (the reference ships TRT symbolics for
bev_pool_v2, ``ops/bev_pool_v2/bev_pool.py:94-130``).  Honest perf
note (BENCH.md): on v5e the observed int8 MXU advantage (~1.15-1.5x on
isolated convs, nowhere near the nominal 2x) is eaten by the
quant/dequant HBM passes, so the int8 tier is an accuracy/deployment
capability at ~parity speed, not a speedup — eligible 3x3 layers route
through the fused Pallas kernel (``ops/qconv.py``) which keeps the s32
accumulator and epilogue in VMEM; the rest take the XLA s8 conv.

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

The mode is a process-global trace-time switch: it selects which graph
is built when a function is *traced*.  ``jax.jit`` caches by function
identity + argument avals, NOT by the traced graph — a callable jitted
before ``set_mode()`` keeps executing the old mode's graph, so any
jitted callable must be re-created (a fresh ``jax.jit``-wrapped
function object) after switching modes.  In the default ``off`` mode
:class:`Conv` is numerically
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

_MODE = 'off'          # 'off' | 'calib' | 'freeze' | 'int8' | 'qat'
_VALID = ('off', 'calib', 'freeze', 'int8', 'qat')


def set_mode(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f'quant mode {mode!r} not in {_VALID}')
    _MODE = mode


def get_mode() -> str:
    return _MODE


_FUSED = False        # opt-in: measured slower in-model on v5e (the
#                       per-layer pad/stack/slice passes around the
#                       kernel outweigh its VMEM win; see BENCH.md)


def set_fused(on: bool) -> None:
    """Route eligible int8 convs through the fused Pallas kernel
    (ops/qconv.py) instead of the XLA s8 conv."""
    global _FUSED
    _FUSED = bool(on)


def _fused_eligible(m: 'Conv', x, kernel_size) -> bool:
    """True when the fused Pallas s8 kernel (ops/qconv.py) applies:
    3x3, stride 1, dilation 1, ungrouped, SAME-type padding, MXU-sized
    channel counts, on the TPU backend.  Anything else takes the XLA
    s8 conv path."""
    import jax

    if not _FUSED or jax.default_backend() != 'tpu':
        return False
    if kernel_size != (3, 3) or m.feature_group_count != 1:
        return False
    strides = m.strides if not isinstance(m.strides, int) else (
        (m.strides,) * 2)
    if tuple(strides or (1, 1)) != (1, 1):
        return False
    dil = m.kernel_dilation
    dil = (dil,) * 2 if isinstance(dil, int) else tuple(dil or (1, 1))
    if dil != (1, 1):
        return False
    pad = m.padding
    if not (pad == 'SAME'
            or (not isinstance(pad, str)
                and tuple(map(tuple, pad)) == ((1, 1), (1, 1)))):
        return False
    c, co = x.shape[-1], m.features
    if not (c % 128 == 0 and co % 128 == 0 and x.ndim >= 4):
        return False
    # VMEM budget: the kernel keeps one image's 3 shifted s8 copies and
    # the bf16 output block resident, double-buffered across grid
    # steps; wide layers (e.g. a 768->256 reduce conv at BEV scale)
    # exceed the 128 MB core VMEM and take the XLA path instead.
    h, w = x.shape[-3], x.shape[-2]
    wp = -(-(w + 2) // 8) * 8
    m_out = h * wp
    m_x = -(-m_out // 512) * 512 + 2 * wp
    # Estimate must stay comfortably below the kernel's 100 MB
    # vmem_limit_bytes: double-buffered x3 + output blocks, plus the
    # weights and the 512-row s32 accumulator.
    vmem = (2 * (3 * m_x * c) + 2 * (m_out * co * 2)
            + 9 * c * co + 512 * co * 4)
    return vmem <= 88 * 1024 * 1024


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

        if mode == 'qat':
            return self._qat(x)

        # --- freeze / int8 ---
        return self._deploy(x, mode)

    def _qat(self, x: jnp.ndarray) -> jnp.ndarray:
        """Quantization-aware training: the conv runs in float on
        fake-quantized operands (quantize->dequantize with a
        straight-through-estimator gradient), so training sees the
        deployment rounding error while gradients flow unclipped.
        The activation amax is an EMA over batches (the ``quant``
        collection must be in the train step's mutable list)."""
        import jax

        amax = self.variable('quant', 'act_amax',
                             lambda: jnp.zeros((), jnp.float32))
        batch_amax = jax.lax.stop_gradient(
            jnp.max(jnp.abs(x)).astype(jnp.float32))
        ema = jnp.where(amax.value > 0,
                        0.99 * amax.value + 0.01 * batch_amax,
                        batch_amax)
        if not self.is_initializing():
            amax.value = ema

        def fake_quant(v, s):
            q = jnp.clip(jnp.round(v.astype(jnp.float32) / s),
                         -127, 127) * s
            return (v + jax.lax.stop_gradient(
                q.astype(v.dtype) - v)).astype(v.dtype)

        kernel_size = tuple(self.kernel_size) if not isinstance(
            self.kernel_size, int) else (self.kernel_size,)
        kernel_shape = kernel_size + (
            x.shape[-1] // self.feature_group_count, self.features)
        kernel = self.param('kernel', self.kernel_init, kernel_shape,
                            self.param_dtype)
        bias = (self.param('bias', self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)

        sx = jnp.maximum(jax.lax.stop_gradient(ema), 1e-6) / 127.0
        xq = fake_quant(x, sx)
        sw = jnp.maximum(jax.lax.stop_gradient(
            jnp.max(jnp.abs(kernel.astype(jnp.float32)),
                    axis=tuple(range(kernel.ndim - 1)))) / 127.0, 1e-12)
        wq = fake_quant(kernel, sw)
        y = self._lax_conv(xq, wq, kernel_size, None)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(x.dtype)

    def _lax_conv(self, x, w, kernel_size, preferred):
        """Run the conv with self's config via lax (the parent's call
        path reads ``self.param('kernel')`` so substituted operands
        need a manual lowering).  Flattens extra leading batch dims the
        way ``nn.Conv`` does (DepthNet passes (B,N,H,W,C))."""
        import jax.lax as lax

        num_spatial = len(kernel_size)
        lead_shape = x.shape[:x.ndim - num_spatial - 1]
        if len(lead_shape) != 1:
            x = x.reshape((-1,) + x.shape[x.ndim - num_spatial - 1:])

        strides = tuple(self.strides) if not isinstance(
            self.strides, int) else (self.strides,) * num_spatial
        dilation = self.kernel_dilation
        if dilation is None:
            dilation = (1,) * num_spatial
        elif isinstance(dilation, int):
            dilation = (dilation,) * num_spatial
        padding: Union[str, Sequence[Tuple[int, int]]] = self.padding

        spatial = ''.join('HWD'[:num_spatial])
        dn = lax.conv_dimension_numbers(
            x.shape, w.shape,
            (f'N{spatial}C', f'{spatial}IO', f'N{spatial}C'))
        y = lax.conv_general_dilated(
            x, w, strides, padding, rhs_dilation=tuple(dilation),
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
            preferred_element_type=preferred)
        if len(lead_shape) != 1:
            y = y.reshape(lead_shape + y.shape[1:])
        return y

    def _deploy(self, x: jnp.ndarray, mode: str) -> jnp.ndarray:
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
            from omnihd_scenes_tpu.ops.qconv import quantize_weights

            y = super().__call__(x)
            w8_f, sw_f = quantize_weights(
                self.get_variable('params', 'kernel'))
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

        if _fused_eligible(self, x, kernel_size):
            # Fused Pallas path: s32 accumulator and the dequant(+bias)
            # epilogue stay in VMEM — HBM sees s8 in, bf16 out (the
            # XLA path below materializes an int32 output tensor).
            from omnihd_scenes_tpu.ops.qconv import (qconv3x3,
                                                     quantize_act,
                                                     quantize_weights)

            x8, sx = quantize_act(x, amax)
            if self.has_variable('quant', 'w8'):
                w8 = self.get_variable('quant', 'w8')
                sw = self.get_variable('quant', 'w_scale')
            else:
                w8, sw = quantize_weights(kernel)
            shift = (bias.astype(jnp.float32) if bias is not None
                     else jnp.zeros((self.features,), jnp.float32))
            lead = x8.shape[:-3]
            x8 = x8.reshape((-1,) + x8.shape[-3:])
            y = qconv3x3(x8, w8, sx * sw, shift, relu=False)
            return y.reshape(lead + y.shape[1:]).astype(x.dtype)

        from omnihd_scenes_tpu.ops.qconv import quantize_act, quantize_weights

        x8, sx = quantize_act(x, amax)
        if self.has_variable('quant', 'w8'):
            w8 = self.get_variable('quant', 'w8')
            sw = self.get_variable('quant', 'w_scale')
        else:
            w8, sw = quantize_weights(kernel)

        y32 = self._lax_conv(x8, w8, kernel_size, jnp.int32)
        y = y32.astype(jnp.float32) * (sx * sw)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)
