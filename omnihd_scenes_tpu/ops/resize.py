"""Integer-factor bilinear upsampling as phase-decomposed shifted adds.

Parity target: the reference FPNC's ``F.interpolate(..., 'bilinear')``
to ``final_dim/downsample`` (``bevfusion/necks/fpnc.py:45-118``) and
the FPN top-down 2x upsample.

Why not ``jax.image.resize``: XLA lowers it through interpolation-
weight contractions whose skinny dots map poorly onto the MXU — the
FPNC resizes alone measured 2.5 ms/sample (BENCH.md round 2).  For an
INTEGER factor f with the half-pixel convention, every output pixel at
phase (p, q) = (o mod f) is a fixed 2x2-tap blend of its source
neighborhood with phase-constant weights:

    src = (o + 0.5)/f - 0.5 ;  i0 = floor(src) ;  w1 = src - i0

so the whole upsample is, per phase, two weighted shifted copies along
H then W (pure VPU multiply-adds on contiguous slices, no gather), and
a phase-interleave reshape.  XLA fuses the blends into neighbours; the
op becomes HBM-bound at ~(1 read + 1 write).

Boundary semantics: taps are edge-clamped, which equals
``jax.image.resize``'s weight renormalization for the 2-tap linear
kernel (verified exactly in tests/test_resize.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _phase_taps(f: int):
    """Per-phase (i0, w0, w1) for the half-pixel convention."""
    taps = []
    for p in range(f):
        src = (p + 0.5) / f - 0.5
        i0 = int(np.floor(src))
        w1 = src - i0
        taps.append((i0, 1.0 - w1, w1))
    return taps


def upsample_bilinear_int(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Bilinear-upsample the (..., H, W, C) array by integer factor f
    (half-pixel convention, edge clamp) — matches
    ``jax.image.resize(..., method='bilinear')`` for integral factors.
    """
    if f == 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    dt = x.dtype
    taps = _phase_taps(f)

    # Edge-clamp pad by one on each spatial side.
    pad = [(0, 0)] * len(lead) + [(1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode='edge')

    def rows_for(i0, w0, w1):
        a = jax.lax.slice_in_dim(xp, i0 + 1, i0 + 1 + h, axis=-3)
        b = jax.lax.slice_in_dim(xp, i0 + 2, i0 + 2 + h, axis=-3)
        return (a * jnp.asarray(w0, dt) + b * jnp.asarray(w1, dt))

    # H pass per phase -> stack on a new axis after H.
    hphases = [rows_for(*t) for t in taps]          # each (..., H, W+2, C)
    yh = jnp.stack(hphases, axis=-3)                # (..., H, f, W+2, C)
    yh = yh.reshape(lead + (h * f, w + 2, x.shape[-1]))

    def cols_for(i0, w0, w1):
        a = jax.lax.slice_in_dim(yh, i0 + 1, i0 + 1 + w, axis=-2)
        b = jax.lax.slice_in_dim(yh, i0 + 2, i0 + 2 + w, axis=-2)
        return (a * jnp.asarray(w0, dt) + b * jnp.asarray(w1, dt))

    wphases = [cols_for(*t) for t in taps]          # each (..., fH, W, C)
    yw = jnp.stack(wphases, axis=-2)                # (..., fH, W, f, C)
    return yw.reshape(lead + (h * f, w * f, x.shape[-1]))


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to ``hw``: the phase-decomposed fast path for
    integral upsampling factors, ``jax.image.resize`` otherwise."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = hw
    if (th, tw) == (h, w):
        return x
    if th % h == 0 and tw % w == 0 and th // h == tw // w >= 4:
        # f2 measured SLOWER than jax.image.resize on v5e (3.25 vs
        # 2.16 ms at the FPNC (68,120,256)x24 shape): at factor 2 the
        # interpolation contraction isn't skinny enough to hurt, while
        # the phase interleave pays a full relayout of the (largest)
        # output tensor.  f4: 1.29 vs 1.66, f8: 0.88 vs 1.47 — the
        # phase path wins only from factor 4 up.
        return upsample_bilinear_int(x, th // h)
    return jax.image.resize(x, x.shape[:-3] + tuple(hw) + x.shape[-1:],
                            method='bilinear')
