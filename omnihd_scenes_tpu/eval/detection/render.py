"""PR / TP curve rendering (reference
``newscenes_devkit/eval/detection/render.py``).  Own layout, same
artifact set: summary grid, per-class PR/TP curves, per-distance PR."""

from __future__ import annotations

import matplotlib
matplotlib.use('Agg')  # headless
import matplotlib.pyplot as plt
import numpy as np

from omnihd_scenes_tpu.eval.detection.constants import (
    DETECTION_COLORS, PRETTY_DETECTION_NAMES, PRETTY_TP_METRICS, TP_METRICS,
    TP_METRICS_UNITS)


def _setup_axis(ax, xlabel=None, ylabel=None, xlim=1, ylim=1,
                min_precision=None, min_recall=None, title=None):
    if title is not None:
        ax.set_title(title)
    if xlabel is not None:
        ax.set_xlabel(xlabel)
    if ylabel is not None:
        ax.set_ylabel(ylabel)
    ax.set_xlim(0, xlim)
    if ylim is not None:
        ax.set_ylim(0, ylim)
    if min_recall is not None:
        ax.axvline(x=min_recall, linestyle='--', color=(0, 0, 0, 0.3))
    if min_precision is not None:
        ax.axhline(y=min_precision, linestyle='--', color=(0, 0, 0, 0.3))
    return ax


def class_pr_curve(md_list, metrics, detection_name, min_precision,
                   min_recall, savepath=None, ax=None):
    """Recall-precision curves of one class over all distance thresholds."""
    if ax is None:
        _, ax = plt.subplots(figsize=(7.5, 5))
    _setup_axis(ax, xlabel='Recall', ylabel='Precision',
                min_precision=min_precision, min_recall=min_recall,
                title=PRETTY_DETECTION_NAMES[detection_name] + ' PR')
    for md, dist_th in md_list.get_class_data(detection_name):
        ap = metrics.get_label_ap(detection_name, dist_th)
        ax.plot(md.recall, md.precision,
                label=f'dist={dist_th}m (AP {ap * 100:.1f})')
    ax.legend(loc='best')
    if savepath is not None:
        plt.savefig(savepath)
        plt.close()


def class_tp_curve(md_list, metrics, detection_name, min_recall, dist_th_tp,
                   savepath=None, ax=None):
    """TP-error curves of one class at the TP distance threshold."""
    md = md_list[(detection_name, dist_th_tp)]
    if ax is None:
        _, ax = plt.subplots(figsize=(7.5, 5))
    # Cap the y-axis a little above the largest TP error in the valid range.
    rel_ind = md.max_recall_ind + 1
    if rel_ind > 0:
        ylimit = max(max(getattr(md, m)[:rel_ind].tolist() or [1.0])
                     for m in TP_METRICS) * 1.1
    else:
        ylimit = 1.0
    ylimit = max(ylimit, 0.1)  # keep the axis non-degenerate when errors ~ 0
    _setup_axis(ax, xlabel='Recall', ylabel='Error', ylim=ylimit,
                min_recall=min_recall,
                title=PRETTY_DETECTION_NAMES[detection_name] + ' TP errors')
    for metric in TP_METRICS:
        tp = metrics.get_label_tp(detection_name, metric)
        if np.isnan(tp):
            continue
        ax.plot(md.recall[:rel_ind], getattr(md, metric)[:rel_ind],
                label=f'{PRETTY_TP_METRICS[metric]} '
                      f'({tp:.2f} {TP_METRICS_UNITS[metric]})')
    ax.axvline(x=md.max_recall, linestyle='-.', color=(0, 0, 0, 0.3))
    ax.legend(loc='best')
    if savepath is not None:
        plt.savefig(savepath)
        plt.close()


def dist_pr_curve(md_list, metrics, dist_th, min_precision, min_recall,
                  savepath=None):
    """PR curves of all classes at a single distance threshold."""
    _, ax = plt.subplots(figsize=(7.5, 5))
    _setup_axis(ax, xlabel='Recall', ylabel='Precision',
                min_precision=min_precision, min_recall=min_recall,
                title=f'PR @ dist={dist_th}m')
    for md, detection_name in md_list.get_dist_data(dist_th):
        ap = metrics.get_label_ap(detection_name, dist_th)
        ax.plot(md.recall, md.precision,
                color=DETECTION_COLORS[detection_name],
                label=f'{PRETTY_DETECTION_NAMES[detection_name]} '
                      f'(AP {ap * 100:.1f})')
    ax.legend(loc='best')
    if savepath is not None:
        plt.savefig(savepath)
        plt.close()


def summary_plot(md_list, metrics, min_precision, min_recall, dist_th_tp,
                 savepath=None):
    """Grid of per-class PR + TP panels."""
    classes = sorted({name for name, _ in md_list.md.keys()})
    n = len(classes)
    fig, axes = plt.subplots(nrows=n, ncols=2, figsize=(15, 5 * n),
                             squeeze=False)
    for i, detection_name in enumerate(classes):
        class_pr_curve(md_list, metrics, detection_name, min_precision,
                       min_recall, ax=axes[i][0])
        class_tp_curve(md_list, metrics, detection_name, min_recall,
                       dist_th_tp, ax=axes[i][1])
    plt.tight_layout()
    if savepath is not None:
        plt.savefig(savepath)
        plt.close()


def visualize_sample(*args, **kwargs):  # pragma: no cover
    """BEV GT-vs-pred scatter; unfinished in the reference too."""
    raise NotImplementedError
