"""Param-tree remapping for staged pretraining.

Parity target: the reference's partial-checkpoint loaders
(``tools/train.py:276-428``): ``load_img_from`` (rename backbone/neck ->
img_*), ``load_img_from_and_not_change_state_dict`` (drop bbox_head),
``load_lift_from`` (load a trained camera/LSS branch, drop the
detection head), ``load_pts_from`` (rename to pts_*) — all strict=False
with per-key verification.  Configs chain them
(``configs/bevfusion_NewScenes/bevfusion.py:288-290``) to assemble the
fusion model from single-modality pretrainings.

Flax params are nested dicts, so the policies become path-prefix
operations on flattened trees, with the same logged per-key
verification.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def remap_params(target_params,
                 source_params,
                 rename: Optional[Dict[str, str]] = None,
                 drop_prefixes: Tuple[str, ...] = (),
                 verbose: bool = True):
    """Merge source params into target with renames/drops.

    Args:
        target_params: the model's freshly initialized param tree.
        source_params: the checkpointed tree to pull weights from.
        rename: top-level (or slash-path) prefix renames applied to
            source paths, e.g. {'backbone': 'img_backbone'}.
        drop_prefixes: source path prefixes to discard (e.g. the
            detection head for ``load_lift_from``).

    Returns:
        (merged_params, report) where report lists loaded / skipped /
        missing keys — the reference's per-key verification loop.
    """
    rename = rename or {}
    tflat = _flatten(target_params)
    sflat = _flatten(source_params)

    remapped: Dict[Tuple[str, ...], np.ndarray] = {}
    for path, v in sflat.items():
        joined = '/'.join(path)
        if any(joined.startswith(p) for p in drop_prefixes):
            continue
        for old, new in rename.items():
            if joined.startswith(old):
                joined = new + joined[len(old):]
                break
        remapped[tuple(joined.split('/'))] = v

    loaded, skipped, mismatched = [], [], []
    merged = dict(tflat)
    for path, v in remapped.items():
        if path in tflat:
            if np.shape(tflat[path]) == np.shape(v):
                merged[path] = v
                loaded.append('/'.join(path))
            else:
                mismatched.append('/'.join(path))
        else:
            skipped.append('/'.join(path))
    missing = [
        '/'.join(p) for p in tflat if p not in remapped]

    report = {'loaded': loaded, 'skipped': skipped,
              'mismatched': mismatched, 'missing': missing}
    if verbose:
        print(f'[ckpt_remap] loaded {len(loaded)} keys, '
              f'skipped {len(skipped)} (not in model), '
              f'{len(mismatched)} shape mismatches, '
              f'{len(missing)} left at init')
        for k in mismatched:
            print(f'[ckpt_remap]   shape mismatch: {k}')
    return _unflatten(merged), report


def load_lift_from(target_params, lss_ckpt_params, verbose: bool = True):
    """Load a trained camera/LSS branch, dropping its detection head
    (reference ``load_lift_from``, tools/train.py:377-405)."""
    return remap_params(target_params, lss_ckpt_params,
                        drop_prefixes=('Anchor3DHead_0', 'det_head'),
                        verbose=verbose)


def load_pts_from(target_params, pts_ckpt_params, verbose: bool = True):
    """Load a trained point-cloud branch (reference ``load_pts_from``)."""
    return remap_params(target_params, pts_ckpt_params, verbose=verbose)
