"""Evaluation: top-1/top-5, confusion matrix, per-class reports,
prediction grids and TTA ensembling.

Rebuilds evaluate_model (test_hqa.py:133-164), plot_confusion_matrix
(:167-178), analyze_class_performance (:181-195), visualize_predictions
(:198-223) and validate_tta (HQAViT_C100_Finetune.py:346-384) — all pure
numpy/matplotlib on host over jit'd model outputs.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np


def evaluate(eval_step: Callable, state, loader,
             preprocess: Optional[Callable] = None,
             collect_logits: bool = False) -> Dict[str, float]:
    """Full-dataset eval: returns avg loss, top-1/top-5 percentages (and
    optionally all logits/labels for downstream analysis)."""
    loss_sum = 0.0
    top1 = 0
    top5 = 0
    count = 0
    logits_all: List[np.ndarray] = []
    labels_all: List[np.ndarray] = []
    for images, labels in loader:
        if preprocess is not None:
            images = preprocess(images)
        m = eval_step(state, images, labels)
        loss_sum += float(m["loss_sum"])
        top1 += int(m["top1"])
        top5 += int(m["top5"])
        count += int(m["count"])
        if collect_logits:
            logits_all.append(np.asarray(m["logits"]))
            labels_all.append(np.asarray(labels))
    out = {
        "loss": loss_sum / max(count, 1),
        "top1": 100.0 * top1 / max(count, 1),
        "top5": 100.0 * top5 / max(count, 1),
        "count": count,
    }
    if collect_logits:
        out["logits"] = np.concatenate(logits_all)
        out["labels"] = np.concatenate(labels_all)
    return out


def confusion_matrix(preds: np.ndarray, labels: np.ndarray,
                     num_classes: int) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (labels, preds), 1)
    return cm


def plot_confusion_matrix(cm: np.ndarray, out_path: str,
                          class_names: Optional[Sequence[str]] = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 10))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion Matrix")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def classification_report(preds: np.ndarray, labels: np.ndarray,
                          num_classes: int) -> Dict[int, Dict[str, float]]:
    """Per-class precision/recall/f1 (sklearn-free)."""
    report = {}
    for c in range(num_classes):
        tp = int(((preds == c) & (labels == c)).sum())
        fp = int(((preds == c) & (labels != c)).sum())
        fn = int(((preds != c) & (labels == c)).sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        report[c] = {"precision": prec, "recall": rec, "f1": f1,
                     "support": tp + fn}
    return report


def best_worst_classes(report: Dict[int, Dict[str, float]], k: int = 10,
                       class_names: Optional[Sequence[str]] = None):
    """Best/worst-k classes by precision (test_hqa.py:181-195)."""
    ranked = sorted(report.items(), key=lambda kv: -kv[1]["precision"])
    name = (lambda c: class_names[c]) if class_names else str
    best = [(name(c), r["precision"]) for c, r in ranked[:k]]
    worst = [(name(c), r["precision"]) for c, r in ranked[-k:]]
    return best, worst


def visualize_predictions(images_u8: np.ndarray, preds: np.ndarray,
                          labels: np.ndarray, out_path: str,
                          class_names: Optional[Sequence[str]] = None,
                          n: int = 10):
    """2x5 prediction grid with green/red titles (test_hqa.py:198-223)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(n, len(images_u8))
    cols = 5
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_2d(axes)
    name = (lambda c: class_names[c]) if class_names else str
    for i in range(rows * cols):
        ax = axes[i // cols, i % cols]
        ax.axis("off")
        if i >= n:
            continue
        ax.imshow(images_u8[i])
        ok = preds[i] == labels[i]
        ax.set_title(f"P: {name(int(preds[i]))}\nT: {name(int(labels[i]))}",
                     color="green" if ok else "red", fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def validate_tta(forward: Callable, state, loaders: Iterable,
                 preprocessors: Sequence[Callable]) -> Dict[str, float]:
    """TTA: softmax-average the probabilities of N fixed transforms
    (HQAViT_C100_Finetune.py:346-384).

    ``loaders`` yield aligned (images_u8, labels) batches; each
    preprocessor applies one TTA transform + normalisation on device.
    """
    correct = 0
    total = 0
    for batches in zip(*loaders):
        labels = np.asarray(batches[0][1])
        probs = None
        for (images, _), prep in zip(batches, preprocessors):
            logits = forward(state, prep(images))
            p = np.asarray(jax.nn.softmax(logits, axis=-1))
            probs = p if probs is None else probs + p
        preds = probs.argmax(-1)
        correct += int((preds == labels).sum())
        total += len(labels)
    return {"tta_top1": 100.0 * correct / max(total, 1), "count": total}
