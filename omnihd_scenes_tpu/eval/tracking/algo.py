"""Tracking metrics: per-threshold MOT accumulation + AMOTA/AMOTP.

Parity target: ``newscenes_devkit/eval/tracking/algo.py`` (nuScenes
TrackingEvaluation) — self-contained (no ``motmetrics``): per scene and
frame, predictions above a recall-derived score threshold are matched
to GT by center distance (< dist_th_tp) with identity-preserving
priority (a GT prefers its previously matched track id, the standard
MOT matching rule); MOTA-style counts (TP/FP/FN/IDS) accumulate, and
AMOTA/AMOTP average the nuScenes-updated MOTAR over ``nelem`` recall
thresholds.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np


def _match_frame(gts: List, preds: List, dist_th: float,
                 prev_match: Dict[str, str]):
    """Greedy distance matching with identity preference.

    gts/preds: lists of TrackingBox for one frame, one class.
    prev_match: gt track id -> pred track id from the previous frame.
    Returns (matches [(gt, pred)], unmatched_gts, unmatched_preds).
    """
    if not gts or not preds:
        return [], list(gts), list(preds)

    gt_xy = np.array([g.translation[:2] for g in gts])
    pr_xy = np.array([p.translation[:2] for p in preds])
    dist = np.linalg.norm(gt_xy[:, None] - pr_xy[None, :], axis=-1)

    cand = dist < dist_th
    # Identity preference: zero-cost bonus for continuing a track.
    bonus = np.zeros_like(dist)
    for i, g in enumerate(gts):
        want = prev_match.get(g.tracking_id)
        if want is not None:
            for j, p in enumerate(preds):
                if p.tracking_id == want:
                    bonus[i, j] = -1e3
    cost = np.where(cand, dist + bonus, np.inf)

    matches = []
    used_g, used_p = set(), set()
    order = np.dstack(np.unravel_index(np.argsort(cost, axis=None),
                                       cost.shape))[0]
    for gi, pj in order:
        if cost[gi, pj] == np.inf:
            break
        if gi in used_g or pj in used_p:
            continue
        used_g.add(gi)
        used_p.add(pj)
        matches.append((gts[gi], preds[pj], dist[gi, pj]))
    un_g = [g for i, g in enumerate(gts) if i not in used_g]
    un_p = [p for j, p in enumerate(preds) if j not in used_p]
    return matches, un_g, un_p


def accumulate_class(gt_frames: List[List], pred_frames: List[List],
                     dist_th: float, score_thr: float) -> Dict[str, float]:
    """MOT counts for one class over ordered frames at one threshold."""
    tp = fp = fn = ids = 0
    dist_sum = 0.0
    prev_match: Dict[str, str] = {}
    for gts, preds in zip(gt_frames, pred_frames):
        preds = [p for p in preds if p.tracking_score >= score_thr]
        matches, un_g, un_p = _match_frame(gts, preds, dist_th, prev_match)
        tp += len(matches)
        fp += len(un_p)
        fn += len(un_g)
        dist_sum += sum(m[2] for m in matches)
        new_match = {}
        for g, p, _ in matches:
            if g.tracking_id in prev_match \
                    and prev_match[g.tracking_id] != p.tracking_id:
                ids += 1
            new_match[g.tracking_id] = p.tracking_id
        prev_match = new_match
    ngt = tp + fn
    return {'tp': tp, 'fp': fp, 'fn': fn, 'ids': ids, 'ngt': ngt,
            'motp': dist_sum / tp if tp > 0 else dist_th,
            'recall': tp / ngt if ngt > 0 else 0.0}


def amota_amotp(gt_frames: List[List], pred_frames: List[List],
                dist_th: float, nelem: int = 40,
                min_recall: float = 0.1) -> Dict[str, float]:
    """nuScenes AMOTA/AMOTP over recall-derived score thresholds."""
    scores = sorted({p.tracking_score for frame in pred_frames
                     for p in frame}, reverse=True)
    # Cap the candidate-threshold sweep (quantile subsampling).
    if len(scores) > 4 * nelem:
        step = len(scores) // (4 * nelem)
        scores = scores[::step]
    if not scores:
        return {'amota': 0.0, 'amotp': dist_th, 'mota': 0.0,
                'motp': dist_th, 'recall': 0.0}

    recalls = np.linspace(min_recall, 1.0, nelem)
    motar_list, motp_list = [], []
    best = None
    for r in recalls:
        # Score threshold achieving recall r (approximately): sweep.
        thr = None
        for s in scores:
            counts = accumulate_class(gt_frames, pred_frames, dist_th, s)
            if counts['recall'] >= r:
                thr = s
                stats = counts
                break
        if thr is None:
            motar_list.append(0.0)
            motp_list.append(dist_th)
            continue
        ngt = max(stats['ngt'], 1)
        # nuScenes MOTAR: 1 - (ids + fp + fn - (1 - r) * ngt)/(r * ngt).
        motar = max(0.0, 1.0 - (stats['ids'] + stats['fp'] + stats['fn']
                                - (1.0 - r) * ngt) / max(r * ngt, 1e-9))
        motar_list.append(motar)
        motp_list.append(stats['motp'])
        if best is None or stats['recall'] > best['recall']:
            best = stats

    best = best or {'tp': 0, 'fp': 0, 'fn': 0, 'ids': 0, 'ngt': 1,
                    'motp': dist_th, 'recall': 0.0}
    mota = max(0.0, 1.0 - (best['fp'] + best['fn'] + best['ids'])
               / max(best['ngt'], 1))
    return {'amota': float(np.mean(motar_list)),
            'amotp': float(np.mean(motp_list)),
            'mota': mota, 'motp': best['motp'],
            'recall': best['recall']}
