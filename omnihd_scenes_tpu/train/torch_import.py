"""Torch-checkpoint -> flax importer (pretrained weights / staged
pretraining).

Parity target: the reference's partial-checkpoint loaders
(``/root/reference/tools/train.py:276-428``) which chain-load ImageNet
ResNets and staged single-modality ``.pth`` checkpoints into the fusion
models (``load_img_from`` / ``load_lift_from`` / ``load_pts_from`` with
backbone->img_backbone style renames and per-key verification), and the
implicit torchvision ``pretrained=True`` ImageNet init of every camera
baseline.

Three layers:
  * ``load_state_dict(path)`` — read a ``.pth`` / ``.npz`` into a flat
    ``{torch_key: np.ndarray}`` dict (handles the mm-style
    ``{'state_dict': ...}`` wrapper; strips ``module.`` DDP prefixes).
  * ``import_torchvision_resnet(sd, depth)`` — exact name/layout map
    from torchvision ResNet-18/34/50/101 onto
    :class:`omnihd_scenes_tpu.models.resnet.ResNet` (OIHW->HWIO kernel
    transpose, BN weight/bias/running_* -> scale/bias/mean/var).
  * ``import_by_rules(target_variables, sd, rules)`` — generic mapper:
    each rule maps a torch prefix to a flax path prefix; tensors are
    converted by kind (conv kernel, linear kernel, bn buffer) inferred
    from target rank/shape; returns merged variables + a per-key report
    (the reference's load-verification loop).

The reference policies (rename tables from ``tools/train.py``):
  ``load_img_from``  : backbone->img_backbone, neck->img_neck
  ``load_lift_from`` : keep lift_splat/img_* branches, drop pts_bbox_head
  ``load_pts_from``  : backbone->pts_backbone, neck->pts_neck, ...
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_ARCH_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
_BOTTLENECK = {50, 101}


# ---------------------------------------------------------------------------
# Reading checkpoints
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth`` (or ``.npz``) into {key: np.ndarray}."""
    if path.endswith('.npz'):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        obj = torch.load(path, map_location='cpu', weights_only=False)
        if isinstance(obj, dict) and 'state_dict' in obj:
            obj = obj['state_dict']
        if isinstance(obj, dict) and 'model' in obj \
                and hasattr(next(iter(obj['model'].values()), None), 'numpy'):
            obj = obj['model']
        sd = {k: v.detach().cpu().numpy() for k, v in obj.items()
              if hasattr(v, 'detach')}
    return {(k[len('module.'):] if k.startswith('module.') else k): v
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Tensor layout conversion
# ---------------------------------------------------------------------------

def convert_tensor(torch_key: str, value: np.ndarray,
                   target_shape: Tuple[int, ...]) -> Optional[np.ndarray]:
    """Convert a torch tensor to the flax layout expected at the target.

    conv OIHW -> HWIO; conv-transpose IOHW -> HWIO (flip not needed for
    flax ConvTranspose which uses HWIO with 'kernel'); linear (out, in)
    -> (in, out); 1-D buffers pass through.
    """
    v = np.asarray(value)
    if v.shape == tuple(target_shape):
        return v
    if v.ndim == 4:
        for perm in ((2, 3, 1, 0), (2, 3, 0, 1)):
            if v.transpose(perm).shape == tuple(target_shape):
                return np.ascontiguousarray(v.transpose(perm))
    if v.ndim == 2 and v.T.shape == tuple(target_shape):
        return np.ascontiguousarray(v.T)
    return None


# ---------------------------------------------------------------------------
# torchvision ResNet
# ---------------------------------------------------------------------------

def resnet_name_map(depth: int) -> Dict[str, Tuple[str, ...]]:
    """torch key -> (collection, flax/path) for our ResNet module.

    Flax blocks are sequential (stage structure flattened): torchvision
    ``layer{s}.{j}`` is block index ``sum(blocks[:s-1]) + j``.  Within a
    block: conv1..convN -> Conv_0.., bn1..bnN -> BatchNorm_0..,
    downsample.0/.1 -> the extra Conv/BatchNorm declared last.
    """
    blocks = _ARCH_BLOCKS[depth]
    n_convs = 3 if depth in _BOTTLENECK else 2
    block_name = 'Bottleneck' if depth in _BOTTLENECK else 'BasicBlock'
    out: Dict[str, Tuple[str, ...]] = {}

    def bn(torch_prefix, flax_prefix):
        out[f'{torch_prefix}.weight'] = ('params',) + flax_prefix + ('scale',)
        out[f'{torch_prefix}.bias'] = ('params',) + flax_prefix + ('bias',)
        out[f'{torch_prefix}.running_mean'] = (
            ('batch_stats',) + flax_prefix + ('mean',))
        out[f'{torch_prefix}.running_var'] = (
            ('batch_stats',) + flax_prefix + ('var',))

    out['conv1.weight'] = ('params', 'Conv_0', 'kernel')
    bn('bn1', ('BatchNorm_0',))
    idx = 0
    for s, n_blocks in enumerate(blocks):
        for j in range(n_blocks):
            fb = f'{block_name}_{idx}'
            for c in range(n_convs):
                out[f'layer{s + 1}.{j}.conv{c + 1}.weight'] = (
                    'params', fb, f'Conv_{c}', 'kernel')
                bn(f'layer{s + 1}.{j}.bn{c + 1}', (fb, f'BatchNorm_{c}'))
            if j == 0 and (s > 0 or depth in _BOTTLENECK):
                out[f'layer{s + 1}.{j}.downsample.0.weight'] = (
                    'params', fb, f'Conv_{n_convs}', 'kernel')
                bn(f'layer{s + 1}.{j}.downsample.1',
                   (fb, f'BatchNorm_{n_convs}'))
            idx += 1
    return out


def _get(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def import_torchvision_resnet(sd: Dict[str, np.ndarray], depth: int,
                              target_variables: Optional[Dict] = None,
                              prefix: Tuple[str, ...] = (),
                              verbose: bool = True) -> Tuple[Dict, Dict]:
    """Build (or merge into) flax ResNet variables from a torchvision
    state_dict.

    Args:
        sd: torch state dict (fc.* ignored).
        depth: 18/34/50/101.
        target_variables: optional {'params':..., 'batch_stats':...} to
            merge into (shapes verified); if None a fresh tree is built.
        prefix: flax sub-path of the backbone inside target_variables
            (e.g. ('img_backbone',)).

    Returns:
        (variables, report) — report has loaded/missing/mismatched and
        unused torch keys.
    """
    nmap = resnet_name_map(depth)
    variables: Dict = target_variables if target_variables is not None \
        else {'params': {}, 'batch_stats': {}}
    loaded, mismatched, missing = [], [], []
    for tkey, (coll, *fpath) in nmap.items():
        full = (coll,) + prefix + tuple(fpath)
        if tkey not in sd:
            missing.append(tkey)
            continue
        tgt = _get(variables, full)
        if tgt is not None:
            conv = convert_tensor(tkey, sd[tkey], np.shape(tgt))
            if conv is None:
                mismatched.append(tkey)
                continue
        else:
            if target_variables is not None:
                missing.append(tkey)
                continue
            v = sd[tkey]
            conv = (np.ascontiguousarray(v.transpose(2, 3, 1, 0))
                    if v.ndim == 4 else v)
        _set(variables, full, conv.astype(np.float32))
        loaded.append(tkey)
    unused = [k for k in sd
              if k not in nmap and not k.startswith(('fc.',))
              and not k.endswith('num_batches_tracked')]
    report = {'loaded': loaded, 'missing': missing,
              'mismatched': mismatched, 'unused': unused}
    if verbose:
        print(f'[torch_import] resnet{depth}: {len(loaded)} loaded, '
              f'{len(missing)} missing, {len(mismatched)} mismatched, '
              f'{len(unused)} unused torch keys')
    return variables, report


# ---------------------------------------------------------------------------
# Generic rule-driven import (reference staged-pretrain policies)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def import_by_rules(target_variables: Dict,
                    sd: Dict[str, np.ndarray],
                    rules: Sequence[Tuple[str, Tuple[str, ...]]],
                    drop_prefixes: Sequence[str] = (),
                    verbose: bool = True) -> Tuple[Dict, Dict]:
    """Merge a torch state_dict into flax variables via prefix rules.

    Each rule ``(torch_prefix, flax_path_prefix)`` claims torch keys
    starting with ``torch_prefix``; the remainder of the torch key is
    resolved against the flax subtree by trying the literal dotted path
    first and then torchvision-resnet-style names.  Only exact
    shape-convertible tensors load; everything else is reported.
    """
    tflat = _flatten(target_variables)
    by_str = {'/'.join(p): p for p in tflat}
    merged = {p: v for p, v in tflat.items()}
    loaded, skipped, mismatched = [], [], []

    bn_suffix = {'weight': 'scale', 'bias': 'bias',
                 'running_mean': 'mean', 'running_var': 'var'}

    for tkey, value in sd.items():
        if any(tkey.startswith(d) for d in drop_prefixes):
            continue
        if tkey.endswith('num_batches_tracked'):
            continue
        match = None
        for torch_prefix, flax_prefix in rules:
            if not tkey.startswith(torch_prefix):
                continue
            rest = tkey[len(torch_prefix):].lstrip('.')
            parts = rest.split('.')
            candidates = []
            # literal path: a.b.weight -> a/b/kernel (conv/linear) etc.
            if parts[-1] == 'weight':
                candidates.append(flax_prefix + tuple(parts[:-1])
                                  + ('kernel',))
                candidates.append(flax_prefix + tuple(parts[:-1])
                                  + ('scale',))
            elif parts[-1] in bn_suffix:
                candidates.append(flax_prefix + tuple(parts[:-1])
                                  + (bn_suffix[parts[-1]],))
            else:
                candidates.append(flax_prefix + tuple(parts))
            for cand in candidates:
                for coll in ('params', 'batch_stats'):
                    full = (coll,) + cand
                    if full in tflat:
                        match = full
                        break
                if match:
                    break
            if match:
                break
        if match is None:
            skipped.append(tkey)
            continue
        conv = convert_tensor(tkey, value, np.shape(tflat[match]))
        if conv is None:
            mismatched.append(
                f'{tkey}: {np.shape(value)} -> {np.shape(tflat[match])}')
            continue
        merged[match] = conv.astype(np.float32)
        loaded.append(tkey)

    out: Dict = {}
    for path, v in merged.items():
        _set(out, path, v)
    n_target = len(tflat)
    report = {'loaded': loaded, 'skipped': skipped,
              'mismatched': mismatched,
              'coverage': len(loaded) / max(n_target, 1)}
    if verbose:
        print(f'[torch_import] rules: {len(loaded)}/{n_target} target '
              f'leaves loaded, {len(skipped)} torch keys unmatched, '
              f'{len(mismatched)} shape mismatches')
        for m in mismatched[:20]:
            print(f'[torch_import]   mismatch {m}')
    return out, report


# Reference rename policies (tools/train.py:276-428).
LOAD_IMG_FROM_RULES = (
    ('backbone', ('img_backbone',)),
    ('neck', ('img_neck',)),
    ('img_backbone', ('img_backbone',)),
    ('img_neck', ('img_neck',)),
)


# ---------------------------------------------------------------------------
# Experiment-workflow glue (config keys -> importer calls)
# ---------------------------------------------------------------------------

def find_backbone_prefix(variables: Dict) -> Optional[Tuple[str, ...]]:
    """Locate the image-backbone ResNet subtree inside a flax variables
    tree.

    Our models name the backbone differently (``img_backbone`` under
    setup-style modules, ``ResNet_0`` under ``nn.compact`` parents); the
    ResNet subtree is recognized structurally: a params dict holding a
    ``Conv_0`` stem and a ``BasicBlock_0``/``Bottleneck_0`` child.
    Returns the path *below* the collection key, or None.
    """
    params = variables.get('params', variables)

    def _scan(tree, path):
        if not isinstance(tree, dict):
            return None
        if 'Conv_0' in tree and ('BasicBlock_0' in tree
                                 or 'Bottleneck_0' in tree):
            return path
        for k, v in tree.items():
            found = _scan(v, path + (k,))
            if found is not None:
                return found
        return None

    return _scan(params, ())


def _looks_like_torchvision_resnet(sd: Dict[str, np.ndarray]) -> bool:
    return 'conv1.weight' in sd and any(k.startswith('layer1.')
                                        for k in sd)


def resolve_pretrained_path(spec: str) -> str:
    """Resolve a ``pretrained=`` spec to a local checkpoint path.

    ``torchvision://resnet50`` (the reference's implicit ImageNet init)
    resolves against the local torch-hub cache — this environment has
    no network egress, so the weight file must already be on disk.
    Any other spec is a filesystem path.
    """
    if spec.startswith('torchvision://'):
        import glob
        import os

        name = spec[len('torchvision://'):]
        hub = os.environ.get(
            'TORCH_HOME', os.path.expanduser('~/.cache/torch'))
        hits = sorted(glob.glob(
            os.path.join(hub, 'hub', 'checkpoints', f'{name}-*.pth')))
        if not hits:
            raise FileNotFoundError(
                f'{spec}: no cached torchvision weights under '
                f'{hub}/hub/checkpoints (no network egress here — '
                f'place the .pth there or use load_img_from=<path>)')
        return hits[-1]
    return spec


def apply_pretrained(variables: Dict, *,
                     pretrained: Optional[str] = None,
                     load_img_from: Optional[str] = None,
                     resnet_depth: Optional[int] = None,
                     verbose: bool = True) -> Tuple[Dict, Dict]:
    """Wire the reference's pretrained-init config keys into the
    importer (reference ``tools/train.py:276-428`` + the implicit
    torchvision ``pretrained=`` of every camera baseline).

    ``pretrained='torchvision://resnet50'`` or a raw path, and/or
    ``load_img_from=<.pth>`` (an mm-style detector checkpoint whose
    ``backbone``/``neck`` keys rename onto img_backbone/img_neck).
    A bare torchvision-format state dict given to ``load_img_from``
    routes through the exact ResNet name map.

    Returns (merged variables, {key: report}).
    """
    reports: Dict[str, Dict] = {}
    if pretrained:
        path = resolve_pretrained_path(pretrained)
        sd = load_state_dict(path)
        if not _looks_like_torchvision_resnet(sd):
            raise ValueError(f'pretrained={pretrained}: not a '
                             'torchvision ResNet state dict')
        depth = resnet_depth
        if depth is None and pretrained.startswith('torchvision://'):
            import re

            m = re.search(r'resnet(\d+)', pretrained)
            depth = int(m.group(1)) if m else None
        if depth is None:
            raise ValueError('resnet_depth required to import '
                             f'pretrained={pretrained}')
        prefix = find_backbone_prefix(variables)
        if prefix is None:
            raise ValueError('no ResNet backbone found in the model '
                             'variables to receive pretrained weights')
        variables, reports['pretrained'] = import_torchvision_resnet(
            sd, depth, target_variables=variables, prefix=prefix,
            verbose=verbose)

    if load_img_from:
        sd = load_state_dict(load_img_from)
        if _looks_like_torchvision_resnet(sd):
            depth = resnet_depth
            if depth is None:
                # infer from block count: layer4.{j}. max index
                import re

                idx = [int(m.group(1)) for k in sd
                       for m in [re.match(r'layer4\.(\d+)\.', k)] if m]
                n4 = max(idx) + 1 if idx else 0
                has_bn3 = any('.bn3.' in k for k in sd)
                depth = ({2: 18, 3: 34}.get(n4, 34) if not has_bn3
                         else {3: 101 if any(
                             k.startswith('layer3.22.') for k in sd)
                             else 50}.get(n4, 50))
            prefix = find_backbone_prefix(variables)
            if prefix is None:
                raise ValueError('no ResNet backbone found in the model '
                                 'variables for load_img_from')
            variables, reports['load_img_from'] = import_torchvision_resnet(
                sd, depth, target_variables=variables, prefix=prefix,
                verbose=verbose)
        else:
            # mm-style detector checkpoint: rename-rule import.  When
            # the model names its backbone structurally (nn.compact
            # auto-names), rewrite the rule targets onto the located
            # subtree.
            rules = LOAD_IMG_FROM_RULES
            prefix = find_backbone_prefix(variables)
            if prefix is not None and prefix[:1] != ('img_backbone',):
                # nn.compact auto-named backbone: retarget the backbone
                # rules onto the located subtree (neck keys fall through
                # to the literal rules and are reported as skipped when
                # the model has no 'img_neck' path).
                rules = tuple(
                    (t, prefix) if f == ('img_backbone',) else (t, f)
                    for t, f in LOAD_IMG_FROM_RULES)
            variables, reports['load_img_from'] = import_by_rules(
                variables, sd, rules, verbose=verbose)
    return variables, reports
LOAD_PTS_FROM_RULES = (
    ('backbone', ('pts_backbone',)),
    ('neck', ('pts_neck',)),
    ('voxel_encoder', ('pts_voxel_encoder',)),
    ('middle_encoder', ('pts_middle_encoder',)),
    ('bbox_head', ('pts_bbox_head',)),
    ('pts_', ('pts_',)),
)
LOAD_LIFT_FROM_DROPS = ('pts_bbox_head', 'bbox_head')
