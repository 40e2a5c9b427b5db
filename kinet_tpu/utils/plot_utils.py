"""Training-log plotting (reference: src/trackformer/util/plot_utils.py).

The reference plots torch training logs / precision-recall pickles. Here
the equivalents read this framework's artifacts: `metrics.jsonl` files
written by the train loop and metric summaries from tracking runs.
"""
from __future__ import annotations

import json
import os.path as osp
from pathlib import Path

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:  # pragma: no cover
    plt = None


def load_log(output_dir: str) -> list[dict]:
    path = Path(output_dir) / "metrics.jsonl"
    if not path.exists():
        return []
    return [json.loads(l) for l in open(path)]


def plot_logs(
    log_dirs: list[str],
    fields=("AP", "mota", "idf1"),
    output_path: str | None = None,
):
    """Compare runs field-by-field (reference plot_utils.plot_logs)."""
    if plt is None:
        return None
    fig, axes = plt.subplots(1, len(fields), figsize=(5 * len(fields), 4))
    if len(fields) == 1:
        axes = [axes]
    for d in log_dirs:
        recs = load_log(d)
        if not recs:
            continue
        epochs = [r["epoch"] for r in recs]
        for ax, f in zip(axes, fields):
            vals = [r.get(f) for r in recs]
            if any(v is not None for v in vals):
                ax.plot(epochs, [v if v is not None else np.nan for v in vals],
                        label=osp.basename(d))
    for ax, f in zip(axes, fields):
        ax.set_title(f)
        ax.set_xlabel("epoch")
        ax.legend(fontsize=6)
    if output_path:
        fig.savefig(output_path, dpi=110)
        plt.close(fig)
    return fig


def plot_precision_recall(evaluator, output_path: str | None = None):
    """PR curves from the self-contained CocoEvaluator's accumulated
    precisions (reference plot_utils.plot_precision_recall reads pickled
    COCO evals)."""
    if plt is None or evaluator.eval_imgs is None:
        return None
    p = evaluator.eval_imgs["precision"]  # [T, R, K, A]
    from .coco_eval import IOU_THRS, REC_THRS

    fig, ax = plt.subplots(figsize=(6, 5))
    for ti in (0, 5):
        prec = p[ti, :, :, 0]
        prec = prec[:, (prec > -1).any(axis=0)]
        if prec.size:
            ax.plot(REC_THRS, prec.mean(axis=1),
                    label=f"IoU={IOU_THRS[ti]:.2f}")
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.legend()
    if output_path:
        fig.savefig(output_path, dpi=110)
        plt.close(fig)
    return fig
