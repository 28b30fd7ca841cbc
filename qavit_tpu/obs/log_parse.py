"""Training-log parsers and plotters.

Rebuilds visual_hqa450.py:12-144 / visualhqa450_finetune.py:13-79: regex-
parses the epoch-summary blocks of plain-text training logs (the format
printed by TrainingLogger.print_epoch_summary, which mirrors the
reference's load-bearing summary table) into dicts/DataFrames, and renders
the curve dashboards.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional

_EPOCH_RE = re.compile(r"Epoch (\d+) Summary")
_ROW_RES = {
    "train_loss": re.compile(r"Train Loss\s+([\d.]+)"),
    "train_acc": re.compile(r"Train Acc \(%\)\s+([\d.]+)"),
    "val_loss": re.compile(r"Val Loss\s+([\d.]+)"),
    "val_acc": re.compile(r"Val Acc \(%\)\s+([\d.]+)"),
    "ema_val_acc": re.compile(r"EMA Val Acc \(%\)\s+([\d.]+)"),
    "ema_param_dist": re.compile(r"EMA Param Distance\s+([\d.]+)"),
    "lr": re.compile(r"Learning Rate\s+([\d.eE+-]+)"),
    "grad_norm": re.compile(r"Grad Norm\s+([\d.]+)"),
    "epoch_time": re.compile(r"Time \(seconds\)\s+([\d.]+)"),
}


def parse_training_log(path: str) -> Dict[str, List[float]]:
    """Parse epoch-summary blocks into a history dict (same keys as
    training_metrics.json)."""
    text = Path(path).read_text(errors="replace")
    blocks = _EPOCH_RE.split(text)
    history: Dict[str, List[float]] = {"epoch": []}
    # split produces [pre, epoch1, body1, epoch2, body2, ...]
    for i in range(1, len(blocks) - 1, 2):
        epoch = int(blocks[i])
        body = blocks[i + 1]
        history["epoch"].append(epoch)
        for key, rex in _ROW_RES.items():
            m = rex.search(body)
            if m:
                history.setdefault(key, []).append(float(m.group(1)))
    return history


def to_dataframe(history: Dict[str, List[float]]):
    import pandas as pd

    n = len(history.get("epoch", []))
    cols = {k: v for k, v in history.items() if len(v) == n}
    return pd.DataFrame(cols)


def plot_history(history: Dict[str, List[float]], out_path: str,
                 title: Optional[str] = None) -> Optional[str]:
    """Loss/accuracy/LR/grad-norm dashboard from a parsed log."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    ep = history.get("epoch", [])
    if not ep:
        return None
    fig, axes = plt.subplots(2, 2, figsize=(14, 9))
    panels = [
        (["train_loss", "val_loss"], "Loss"),
        (["train_acc", "val_acc", "ema_val_acc"], "Accuracy (%)"),
        (["lr"], "Learning Rate"),
        (["grad_norm"], "Grad Norm"),
    ]
    for ax, (keys, name) in zip(axes.flat, panels):
        for k in keys:
            if k in history:
                ax.plot(ep[:len(history[k])], history[k], label=k)
        ax.set_title(name)
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
