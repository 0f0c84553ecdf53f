"""Conv+BN fusion for deployment checkpoints.

Parity target: ``/root/reference/tools/misc/fuse_conv_bn.py`` — fold
frozen BatchNorm statistics into the preceding conv/dense kernel so the
deployed graph runs a single fused op per layer (and the exported
StableHLO bundle, ``serve/export.py``, carries pre-folded weights).

Pairing is DATAFLOW-EXACT, not name-convention-based: ``trace_pairs``
runs one eager forward under a flax method interceptor and pairs a
BatchNorm with a conv/dense precisely when the BN's input array IS that
layer's output array (object identity) — any intervening op breaks the
pair and the BN is left untouched.  The trace also records each BN's
actual epsilon (they differ across the codebase: flax default 1e-5 vs
``layers.BN_EPS`` 1e-3).

Folding mechanics (all in f32, exact to float rounding):
  conv+BN computes  s_f * conv(x) - s_f*m + b,  s_f = scale/sqrt(var+eps)
  * kernel' = kernel * s_f           (last = output-channel axis)
  * conv bias' = bias * s_f          (when the conv has one)
  * the BN is left in the tree as an exact passthrough-plus-bias:
    scale' = K, var' = K^2 (K = 1e4: eps vanishes below the f32 ulp of
    K^2, so scale'/sqrt(var'+eps) == 1.0 exactly), mean' = 0,
    bias' = b - s_f*m.
  Leaving the BN in place keeps the variable-tree structure (and module
  code) unchanged — no model surgery, checkpoints stay loadable, and
  XLA folds the passthrough into the conv epilogue at compile time.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import numpy as np

_K = 1e4          # passthrough scale: K/sqrt(K^2+eps) == 1.0 in f32

Path = Tuple[str, ...]


def trace_pairs(apply_fn, variables) -> Tuple[Dict[Path, Path],
                                              Dict[Path, float]]:
    """Run ``apply_fn(variables)`` once (eagerly — do NOT jit it: the
    interceptor must observe the module calls) and return
    (bn_path -> linear_path pairs, bn_path -> epsilon).
    """
    produced = {}                     # id(out) -> (ref, linear path)
    pairs: Dict[Path, Path] = {}
    eps: Dict[Path, float] = {}

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.BatchNorm) and mod.path:
            x = args[0] if args else kwargs.get('x')
            hit = produced.get(id(x))
            if hit is not None and hit[0] is x:
                pairs[tuple(mod.path)] = hit[1]
            eps[tuple(mod.path)] = float(mod.epsilon)
            return next_fn(*args, **kwargs)
        out = next_fn(*args, **kwargs)
        if (isinstance(mod, (nn.Conv, nn.ConvTranspose, nn.Dense))
                and mod.path and hasattr(out, 'shape')):
            # Keep a reference so ids stay unique for the trace.
            produced[id(out)] = (out, tuple(mod.path))
        return out

    with nn.intercept_methods(interceptor):
        apply_fn(variables)
    return pairs, eps


def _get(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def fuse_conv_bn(variables: Dict,
                 pairs: Dict[Path, Path],
                 bn_eps: Dict[Path, float],
                 default_eps: float = 1e-5) -> Tuple[Dict, Dict]:
    """Fold each paired BN into its producer's kernel.

    Returns (fused_variables, report) with fused / skipped path lists.
    """
    import jax

    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables.get('batch_stats', {}))
    fused, skipped = [], []

    # A producer consumed by more than one BN must not be folded: each
    # fold rescales the shared kernel again, corrupting every consumer.
    lin_counts: Dict[Path, int] = {}
    for lin_path in pairs.values():
        lin_counts[lin_path] = lin_counts.get(lin_path, 0) + 1

    for bn_path, lin_path in sorted(pairs.items()):
        bn_p = _get(params, bn_path)
        bn_s = _get(stats, bn_path)
        lin = _get(params, lin_path)
        label = '/'.join(bn_path)
        if lin_counts[lin_path] > 1:
            skipped.append(label + ' (producer feeds multiple BNs)')
            continue
        if bn_p is None or 'scale' not in bn_p:
            skipped.append(label + ' (no affine params)')
            continue
        if bn_s is None or 'mean' not in bn_s:
            skipped.append(label + ' (no running stats)')
            continue
        if lin is None or 'kernel' not in lin \
                or lin['kernel'].shape[-1] != bn_p['scale'].shape[0]:
            skipped.append(label + ' (producer kernel mismatch)')
            continue
        eps = bn_eps.get(bn_path, default_eps)
        s_f = (bn_p['scale']
               / np.sqrt(bn_s['var'] + eps)).astype(np.float32)
        lin['kernel'] = (lin['kernel'] * s_f).astype(lin['kernel'].dtype)
        if 'bias' in lin:
            lin['bias'] = (lin['bias'] * s_f).astype(lin['bias'].dtype)
        bn_p['bias'] = (bn_p['bias']
                        - s_f * bn_s['mean']).astype(np.float32)
        bn_p['scale'] = np.full_like(bn_p['scale'], _K)
        bn_s['mean'] = np.zeros_like(bn_s['mean'])
        bn_s['var'] = np.full_like(bn_s['var'], _K * _K)
        fused.append(label)

    out = dict(variables)
    out['params'] = params
    if stats:
        out['batch_stats'] = stats
    return out, {'fused': fused, 'skipped': skipped}


def fuse_model(model, variables, apply_fn,
               verify: bool = True, atol: float = 1e-3,
               rtol: float = 1e-3) -> Tuple[Dict, Dict]:
    """Trace + fuse in one step.  ``apply_fn(variables)`` runs one eager
    eval-mode forward (``model`` kept in the signature for symmetry with
    call sites; only the apply matters).

    ``verify`` re-runs the forward on the fused tree and checks every
    output leaf against the original — the backstop for consumers the
    trace cannot see (a conv output feeding a residual/skip path as well
    as its BN would be silently rescaled on that path).  Raises
    ValueError on mismatch.
    """
    import jax

    pairs, eps = trace_pairs(apply_fn, variables)
    fused_vars, report = fuse_conv_bn(variables, pairs, eps)
    if verify and report['fused']:
        ref = apply_fn(variables)
        out = apply_fn(fused_vars)
        for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            r, o = np.asarray(r, np.float32), np.asarray(o, np.float32)
            if not np.allclose(r, o, atol=atol, rtol=rtol):
                raise ValueError(
                    'fuse_model verification failed: fused forward '
                    f'deviates by {np.abs(r - o).max():.3e} — a folded '
                    'conv output likely has a consumer besides its BN')
        report['verified'] = True
    return fused_vars, report
