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
    tent weights, OOB taps get zero weight.  Differentiable in
    locations (through the tent weights) and attention weights, exactly
    like grid_sample.

    The W row is built SEPARABLY (round-5): the bilinear tap weight
    factorizes as ``tent(y - i) * tent(x - j)``, so instead of
    materializing a (q, nh, np, nk) one-hot per bilinear corner (the
    HBM-bound term the round-5 encoder probe measured), W folds as an
    outer product of two tent matrices of support h + w,

        W(q, h, i, j) = sum_p [attn_p * tent_y(p, i)] * tent_x(p, j),

    a K=np matmul whose operands are ~nk/(h+w) times smaller than the
    one-hot tensor.  Tents evaluated over the full axis reproduce the
    (2,2)-corner weights exactly, including partial corners at the
    table border and zero for fully-OOB taps.
    """
    (h, w), = spatial_shapes
    nq, nh, _, np_, _ = sampling_locations.shape
    head_dim = value.shape[-1]
    nk = h * w
    nkp = _round_up(max(nk, 128), 128)

    if query_chunk is None:
        # Bound the (chunk, nh, nkp) folded-weight transient (the
        # largest intermediate in the separable construction).
        query_chunk = max(256, int(64e6) // max(nh * nkp, 1))
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

    ty = jnp.maximum(0.0, 1.0 - jnp.abs(
        y[..., None] - jnp.arange(h, dtype=y.dtype)))  # (nq, nh, np, h)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(
        x[..., None] - jnp.arange(w, dtype=x.dtype)))  # (nq, nh, np, w)
    # Broadcast-multiply + reduce over p, NOT an einsum: a dot with
    # K=np (4-8) runs the MXU at <6% utilization; the mul+sum fuses on
    # the VPU and only the (nq, nh, nk) result hits HBM.
    wmat = jnp.sum((ty * attn[..., None])[..., :, None]
                   * tx[..., None, :], axis=-3)        # (nq, nh, h, w)
    wmat = wmat.reshape(nq, nh, nk)
    wmat = jnp.pad(wmat, ((0, 0), (0, 0), (0, nkp - nk)))

    v = jnp.pad(value, ((0, nkp - nk), (0, 0), (0, 0)))
    out = jnp.einsum('qhk,khd->qhd', wmat.astype(value.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(value.dtype).reshape(nq, nh * head_dim)


def msda_windowed_bev(value: jnp.ndarray,
                      spatial_shapes,
                      sampling_locations: jnp.ndarray,
                      attention_weights: jnp.ndarray,
                      tile: int = 16,
                      radius: int = 8,
                      tile_chunk: int = 4,
                      halo_map: jnp.ndarray = None) -> jnp.ndarray:
    """Tile-local one-hot dual for GRID-ORDERED queries (TSA/decoder BEV).

    The VERDICT r4 #4 lever: BEV queries are spatially coherent, so a
    per-tile LOCAL window of the value map bounds each query's sampled
    support.  Queries are tiled ``tile x tile``; each tile's window is
    the tile dilated by ``radius`` cells (zero-padded at grid edges),
    and within a tile the same fold as ``_msda_onehot_small_table``
    turns all taps into one (q, window) weight row — so the whole layer
    becomes ``ntiles`` small MXU matmuls instead of millions of
    data-dependent gather rows.  With tile=16, radius=8 the window is
    exactly 32x32 = 1024 rows (one padded matmul operand) and the value
    duplication factor is 4x.

    SEMANTICS: taps whose bilinear support falls outside the query's
    window contribute ZERO (exactly like grid_sample's out-of-bounds
    taps).  This equals the gather path whenever every sampling offset
    stays within ``radius - 1`` cells of the query's own cell — true by
    construction at the deformable-DETR init (max |offset| = num_points
    cells) and asserted loudly in serving by
    :func:`tsa_window_overflow_fraction`.  Queries MUST be in row-major
    grid order matching the (single-level) value map.

    Args match :func:`multi_scale_deformable_attn` with nl == 1 and
    nq == H*W.  Returns (nq, nh * head_dim).
    """
    (h, w), = spatial_shapes
    nq, nh, nl, np_, _ = sampling_locations.shape
    assert nl == 1 and nq == h * w, (nl, nq, h, w)
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    head_dim = value.shape[-1]
    nty, ntx = h // tile, w // tile
    ntiles = nty * ntx
    win = tile + 2 * radius
    nkw = win * win
    nkwp = _round_up(max(nkw, 128), 128)

    # Padded value map and per-tile overlapping windows:
    # (ntiles, win*win, nh, d).  Static slice starts — no gather.
    # ``halo_map``, when given, is a caller-built (h+2r, w+2r, nh, d)
    # map whose halo carries REAL neighbor content instead of zeros —
    # used by the TSA ego-shift roll, where cells beyond the nominal
    # grid edge are valid rolled-in data, not out-of-bounds.
    if halo_map is not None:
        assert halo_map.shape == (h + 2 * radius, w + 2 * radius,
                                  nh, head_dim), halo_map.shape
        vpad = halo_map
    else:
        vmap2d = value.reshape(h, w, nh, head_dim)
        vpad = jnp.pad(vmap2d, ((radius, radius), (radius, radius),
                                (0, 0), (0, 0)))
    starts = [(ty * tile, tx * tile) for ty in range(nty)
              for tx in range(ntx)]
    windows = jnp.stack([
        jax.lax.dynamic_slice(vpad, (sy, sx, 0, 0),
                              (win, win, nh, head_dim))
        for sy, sx in starts]).reshape(ntiles, nkw, nh, head_dim)
    windows = jnp.pad(windows, ((0, 0), (0, nkwp - nkw), (0, 0), (0, 0)))

    # Queries regrouped into tiles: (ntiles, tile*tile, ...).
    def tile_q(a):
        a = a.reshape((nty, tile, ntx, tile) + a.shape[1:])
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape((ntiles, tile * tile) + a.shape[4:])

    loc = tile_q(sampling_locations[:, :, 0])     # (nt, qt, nh, np, 2)
    attn = tile_q(attention_weights[:, :, 0])     # (nt, qt, nh, np)

    # Window origins in absolute pixel coords (top-left texel center of
    # window cell (0,0) sits at (sy - radius, sx - radius)).
    oy = jnp.asarray([s[0] - radius for s in starts], jnp.float32)
    ox = jnp.asarray([s[1] - radius for s in starts], jnp.float32)

    def one_chunk(args):
        loc_c, attn_c, oy_c, ox_c, win_c = args
        # Window-local continuous coords.
        x = loc_c[..., 0] * w - 0.5 - ox_c[:, None, None, None]
        y = loc_c[..., 1] * h - 0.5 - oy_c[:, None, None, None]
        # Separable tent fold (see _msda_onehot_small_table): the
        # (nt, qt, nh, np, win*win) one-hot transient collapses to two
        # (.., win) tent matrices and a K=np outer-product matmul.
        # Tents over the full window axis reproduce the bilinear corner
        # weights exactly; taps outside the window get zero weight —
        # the documented windowed semantics — with no clip branches.
        iw = jnp.arange(win, dtype=x.dtype)
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - iw))
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - iw))
        # mul+reduce over p on the VPU (see _msda_onehot_small_table:
        # a K=np dot would waste the MXU); fuses to one (.., win, win)
        # write.
        wmat = jnp.sum((ty * attn_c[..., None])[..., :, None]
                       * tx[..., None, :], axis=-3)
        wmat = wmat.reshape(wmat.shape[:3] + (nkw,))
        wmat = jnp.pad(wmat, ((0, 0),) * 3 + ((0, nkwp - nkw),))
        return jnp.einsum('tqhk,tkhd->tqhd', wmat.astype(win_c.dtype),
                          win_c, preferred_element_type=jnp.float32)

    nchunks = -(-ntiles // tile_chunk)
    padt = nchunks * tile_chunk - ntiles

    def padtile(a):
        return jnp.pad(a, ((0, padt),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (nchunks, tile_chunk) + a.shape[1:])

    out = jax.lax.map(one_chunk, (padtile(loc), padtile(attn),
                                  padtile(oy), padtile(ox),
                                  padtile(windows)))
    out = out.reshape(nchunks * tile_chunk, tile * tile, nh, head_dim)
    out = out[:ntiles].astype(value.dtype)

    # Un-tile back to row-major query order.
    out = out.reshape(nty, ntx, tile, tile, nh, head_dim)
    out = jnp.moveaxis(out, 2, 1).reshape(nq, nh * head_dim)
    return out


def tsa_window_overflow_fraction(sampling_locations: jnp.ndarray,
                                 spatial_shapes,
                                 radius: int = 8) -> jnp.ndarray:
    """Fraction of taps whose support exceeds the windowed-dual radius.

    Serving guard for ``msda_windowed_bev`` (mirrors the SCA query-cap
    overflow check): the windowed dual is bit-compatible with the
    gather path iff every tap's bilinear support stays within
    ``radius`` cells of its query's own cell.  Grid-ordered queries
    assumed.
    """
    (h, w), = spatial_shapes
    nq = sampling_locations.shape[0]
    assert nq == h * w
    qy = (jnp.arange(nq) // w).astype(jnp.float32)
    qx = (jnp.arange(nq) % w).astype(jnp.float32)
    x = sampling_locations[..., 0] * w - 0.5
    y = sampling_locations[..., 1] * h - 0.5
    # Support cell range [floor(v), floor(v)+1]; window covers
    # [qcell - radius, qcell + tile_pos + radius] — conservative bound:
    # |sample - query cell| <= radius - 1 guarantees containment for
    # any position of the query inside its tile.
    dx = jnp.abs(x - qx[:, None, None, None])
    dy = jnp.abs(y - qy[:, None, None, None])
    over = jnp.maximum(dx, dy) > (radius - 1)
    return jnp.mean(over.astype(jnp.float32))


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
