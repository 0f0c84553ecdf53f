"""Multi-scale deformable attention (XLA formulation).

Parity target: mmcv's ``ms_deform_attn_forward/backward`` CUDA kernels,
loaded by the reference at
``bevformer/modules/multi_scale_deformable_attn_function.py:11-12`` —
the mathematical spec is the pure-PyTorch fallback
``multi_scale_deformable_attn_pytorch`` (used by the reference when no
CUDA, ``temporal_self_attention.py:254-257``): per level, bilinear
sampling of the value map at predicted locations, weighted by the
attention weights, summed over levels and points.

Bilinear sampling follows ``F.grid_sample(align_corners=False,
padding_mode='zeros')`` semantics: normalized locations in [0, 1] map to
pixel centers via ``loc * size - 0.5`` and out-of-bounds taps read 0.
Autodiff provides the backward pass.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(value: jnp.ndarray, loc_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample a (H, W, C) map at continuous pixel-center coords.

    loc_xy: (..., 2) in *pixel* units where (0, 0) is the center of the
    top-left texel (grid_sample align_corners=False after the
    ``loc * size - 0.5`` shift).  OOB taps contribute zero.

    TPU formulation: ONE (2, 2, C) patch gather per location (a
    vmapped dynamic_slice — XLA lowers to a gather with slice_sizes
    (2,2,C), 4x fewer gather rows than four per-tap gathers, and the
    minor dims stay contiguous), with per-cell weights from the tent
    formula ``relu(1-|x-X|) * relu(1-|y-Y|)`` evaluated at the
    patch's absolute coordinates — exactly the bilinear weights, and
    original out-of-bounds taps get weight 0 automatically.
    """
    h, w, c = value.shape
    if h < 2 or w < 2:
        value = jnp.pad(value, ((0, max(0, 2 - h)), (0, max(0, 2 - w)),
                                (0, 0)))
        h, w = max(h, 2), max(w, 2)
        # zero padding preserves grid_sample zero-OOB semantics; the
        # tent weights for the padded cells are multiplied by real
        # zeros only when the location's support reaches them.
    x, y = loc_xy[..., 0], loc_xy[..., 1]
    # Patch anchor, clipped so the (2, 2) slice stays in bounds.  All
    # in-bounds taps of the true support remain covered (see tent
    # weights); pure-OOB locations get all-zero weights.
    ys = jnp.clip(jnp.floor(y), 0, max(h - 2, 0)).astype(jnp.int32)
    xs = jnp.clip(jnp.floor(x), 0, max(w - 2, 0)).astype(jnp.int32)

    flat = jnp.stack([ys.ravel(), xs.ravel()], axis=-1)
    patches = jax.vmap(
        lambda yx: jax.lax.dynamic_slice(value, (yx[0], yx[1], 0),
                                         (2, 2, c)))(flat)
    patches = patches.reshape(x.shape + (2, 2, c))

    dx = x[..., None] - (xs[..., None] + jnp.arange(2))     # (..., 2)
    dy = y[..., None] - (ys[..., None] + jnp.arange(2))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
    wcell = wy[..., :, None] * wx[..., None, :]             # (..., 2, 2)
    return jnp.sum(patches * wcell[..., None], axis=(-3, -2))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Tables at or below this row count route through the one-hot matmul
# dual (see _msda_onehot_small_table).  BEVFormer's SCA samples a
# single stride-32 FPN level — 17x30 = 510 rows at the production
# 544x960 — so the whole table fits one 512-row padded matmul operand;
# the BEV-sized tables (TSA/decoder, 38400 rows) stay on the gather
# path where the dual's W tensor would be larger than the taps.
ONEHOT_MAX_TABLE = 1024


def _msda_onehot_small_table(value: jnp.ndarray,
                             spatial_shapes,
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray,
                             query_chunk: int = None) -> jnp.ndarray:
    """One-hot-matmul dual of single-level deformable attention.

    The round-2 gather-floor analysis ("learned offsets have no
    separable structure to convert into one-hot matmuls") missed that
    separability is unnecessary when the TABLE is small: fold ALL
    taps — the 4 bilinear cells x num_points, each scaled by
    tent x attention weight — into ONE sparse row W(q, h, nk), then

        out(q, h, d) = W(q, h, :) @ value(:, h, d)

    is a dense (nq*nh, nk_pad) x (nk_pad, d) matmul on the MXU.  At the
    production SCA shape (86400 capped queries x 8 heads x 8 points,
    nk=510 -> 512) that is ~23 GFLOP per encoder layer instead of 5.5M
    data-dependent gather rows at the ~20-30 ns/row XLA gather floor
    (~140 ms) — the same trick that replaced the LSS splat scatter.

    Semantics are bit-compatible with the patch-gather path: same
    clipped (2,2) patch anchors, same tent weights, OOB taps get zero
    weight.  Differentiable in locations (through the tent weights) and
    attention weights, exactly like grid_sample.
    """
    (h, w), = spatial_shapes
    nq, nh, _, np_, _ = sampling_locations.shape
    head_dim = value.shape[-1]
    nk = h * w
    nkp = _round_up(max(nk, 128), 128)

    if query_chunk is None:
        # Bound the (chunk, nh, np, nkp) tap-weight transient.
        query_chunk = max(256, int(64e6) // max(nh * np_ * nkp, 1))
    if nq > query_chunk:
        n_chunks = -(-nq // query_chunk)
        pad = n_chunks * query_chunk - nq
        loc_c = jnp.pad(sampling_locations,
                        ((0, pad),) + ((0, 0),) * 4).reshape(
            n_chunks, query_chunk, nh, 1, np_, 2)
        wgt_c = jnp.pad(attention_weights,
                        ((0, pad),) + ((0, 0),) * 3).reshape(
            n_chunks, query_chunk, nh, 1, np_)
        out = jax.lax.map(
            lambda lw: _msda_onehot_small_table(
                value, spatial_shapes, lw[0], lw[1],
                query_chunk=query_chunk),
            (loc_c, wgt_c))
        return out.reshape(n_chunks * query_chunk, nh * head_dim)[:nq]

    loc = sampling_locations[:, :, 0]                 # (nq, nh, np, 2)
    attn = attention_weights[:, :, 0]                 # (nq, nh, np)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    xs = jnp.clip(jnp.floor(x), 0, max(w - 2, 0)).astype(jnp.int32)
    ys = jnp.clip(jnp.floor(y), 0, max(h - 2, 0)).astype(jnp.int32)

    iota = jnp.arange(nkp, dtype=jnp.int32)
    wmat = jnp.zeros((nq, nh, nkp), jnp.float32)
    for dy in (0, 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (ys + dy)))
        for dx in (0, 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (xs + dx)))
            tap_w = wy * wx * attn                    # (nq, nh, np)
            idx = (ys + dy) * w + (xs + dx)           # (nq, nh, np)
            onehot = (idx[..., None] == iota).astype(jnp.float32)
            wmat = wmat + jnp.einsum('qhp,qhpk->qhk', tap_w, onehot)

    v = jnp.pad(value, ((0, nkp - nk), (0, 0), (0, 0)))
    out = jnp.einsum('qhk,khd->qhd', wmat.astype(value.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(value.dtype).reshape(nq, nh * head_dim)


def multi_scale_deformable_attn(value: jnp.ndarray,
                                spatial_shapes: Sequence[Tuple[int, int]],
                                sampling_locations: jnp.ndarray,
                                attention_weights: jnp.ndarray,
                                query_chunk: int = None,
                                impl: str = 'auto') -> jnp.ndarray:
    """Deformable attention for one sample (vmap over batch).

    Args:
        value: (sum_l H_l*W_l, num_heads, head_dim).
        spatial_shapes: static list of (H_l, W_l).
        sampling_locations: (num_query, num_heads, num_levels, num_points,
            2) normalized to [0, 1].
        attention_weights: (num_query, num_heads, num_levels, num_points).
        query_chunk: process queries in sequential chunks of this size
            (``lax.map``) to bound the materialized gather output —
            at production BEV scale (38400 queries x 8 heads x 8 points
            x 32 dims, per camera, doubled by autodiff) the unchunked
            intermediates exceed HBM.  None = auto: chunk only when the
            per-level tap tensor would exceed ~64M elements.

    Returns:
        (num_query, num_heads * head_dim).
    """
    nq, nh, nl, np_, _ = sampling_locations.shape
    head_dim = value.shape[-1]

    if impl == 'auto':
        impl = ('onehot' if (nl == 1 and value.shape[0]
                             <= ONEHOT_MAX_TABLE) else 'gather')
    if impl == 'onehot':
        assert nl == 1, 'onehot dual is single-level'
        return _msda_onehot_small_table(
            value, spatial_shapes, sampling_locations, attention_weights,
            query_chunk=query_chunk)

    if query_chunk is None:
        # Bound the materialized patch tensor (nq, nh, np, 2, 2, d) to
        # ~64M elements (256 MB f32 unpadded) per chunk.
        per_q = nh * np_ * 4 * head_dim
        query_chunk = max(256, int(64e6) // max(per_q, 1))
    if nq > query_chunk:
        n_chunks = -(-nq // query_chunk)
        pad = n_chunks * query_chunk - nq
        loc_c = jnp.pad(sampling_locations,
                        ((0, pad),) + ((0, 0),) * 4).reshape(
            n_chunks, query_chunk, nh, nl, np_, 2)
        wgt_c = jnp.pad(attention_weights,
                        ((0, pad),) + ((0, 0),) * 3).reshape(
            n_chunks, query_chunk, nh, nl, np_)
        out = jax.lax.map(
            lambda lw: multi_scale_deformable_attn(
                value, spatial_shapes, lw[0], lw[1],
                query_chunk=query_chunk),
            (loc_c, wgt_c))
        return out.reshape(n_chunks * query_chunk, nh * head_dim)[:nq]

    out = jnp.zeros((nq, nh, head_dim), value.dtype)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[offset:offset + h * w]                  # (H*W, nh, d)
        offset += h * w
        v = v.reshape(h, w, nh, head_dim)
        loc = sampling_locations[:, :, lvl]               # (nq, nh, np, 2)
        pix = jnp.stack([loc[..., 0] * w - 0.5,
                         loc[..., 1] * h - 0.5], axis=-1)

        def sample_head(vh, loch):
            # vh: (h, w, d); loch: (nq, np, 2) -> (nq, np, d)
            return bilinear_sample(vh, loch)

        sampled = jax.vmap(sample_head, in_axes=(2, 1), out_axes=1)(
            v, pix)                                       # (nq, nh, np, d)
        wgt = attention_weights[:, :, lvl]                # (nq, nh, np)
        out = out + jnp.sum(sampled * wgt[..., None], axis=2)

    return out.reshape(nq, nh * head_dim)
