"""Training metrics logging — byte-compatible ``training_metrics.json``.

Rebuilds TrainingLogger (HQAViT_Tiny_Cifar10.py:67-258) and
TrainingHistory (HQAViT_IN_Tiny.py:227-456): a history dict keyed exactly
like the reference ({'history': {epoch, train_loss, train_acc, val_loss,
val_acc, lr, grad_norm, epoch_time, [ema_val_loss, ema_val_acc,
ema_param_dist]}, 'best_val_acc', 'total_time'}) serialised to
``training_metrics.json``, plus the multi-panel matplotlib dashboards.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

BASE_KEYS = ("epoch", "train_loss", "train_acc", "val_loss", "val_acc",
             "lr", "grad_norm", "epoch_time")
EMA_KEYS = ("ema_val_loss", "ema_val_acc", "ema_param_dist")


class TrainingLogger:
    def __init__(self, log_dir: str, track_ema: bool = False):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        keys = BASE_KEYS + (EMA_KEYS if track_ema else ())
        self.history: Dict[str, list] = {k: [] for k in keys}
        self.best_val_acc = 0.0
        self.best_ema_val_acc = 0.0
        self.start_time = time.time()

    def log_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        self.history["epoch"].append(epoch)
        for key, value in metrics.items():
            if key in self.history:
                self.history[key].append(float(value))
        if metrics.get("val_acc", -1.0) > self.best_val_acc:
            self.best_val_acc = float(metrics["val_acc"])
        if metrics.get("ema_val_acc", -1.0) > self.best_ema_val_acc:
            self.best_ema_val_acc = float(metrics["ema_val_acc"])

    def save(self) -> Path:
        out = self.log_dir / "training_metrics.json"
        with open(out, "w") as f:
            json.dump({
                "history": self.history,
                "best_val_acc": self.best_val_acc,
                "total_time": time.time() - self.start_time,
            }, f, indent=2)
        return out

    # reference epoch-summary print block (format is load-bearing: the
    # visual_hqa450.py parsers regex it — SURVEY.md §5.5)
    def print_epoch_summary(self, epoch: int, metrics: Dict[str, float],
                            extra: Optional[Dict[str, float]] = None):
        print("=" * 100)
        print(f"Epoch {epoch} Summary")
        rows = [("Train Loss", "train_loss"), ("Train Acc (%)", "train_acc"),
                ("Val Loss", "val_loss"), ("Val Acc (%)", "val_acc"),
                ("EMA Val Acc (%)", "ema_val_acc"),
                ("EMA Param Distance", "ema_param_dist"),
                ("Learning Rate", "lr"), ("Grad Norm", "grad_norm"),
                ("Time (seconds)", "epoch_time")]
        for label, key in rows:
            if key in metrics:
                print(f"{label:<38} {metrics[key]:.4f}")
        for label, value in (extra or {}).items():
            print(f"{label:<38} {value}")
        print("=" * 100)

    def plot(self) -> Optional[Path]:
        """Multi-panel training dashboard
        (HQAViT_Tiny_Cifar10.py:110-258)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        h = self.history
        if not h["epoch"]:
            return None
        fig, axes = plt.subplots(2, 3, figsize=(18, 10))
        ep = h["epoch"]

        def _plot(ax, keys, title, ylabel):
            for k in keys:
                if h.get(k):
                    ax.plot(ep[:len(h[k])], h[k], label=k)
            ax.set_title(title)
            ax.set_xlabel("epoch")
            ax.set_ylabel(ylabel)
            ax.legend()
            ax.grid(alpha=0.3)

        _plot(axes[0, 0], ["train_loss", "val_loss"], "Loss", "loss")
        _plot(axes[0, 1], ["train_acc", "val_acc", "ema_val_acc"],
              "Accuracy", "%")
        _plot(axes[0, 2], ["lr"], "Learning Rate", "lr")
        _plot(axes[1, 0], ["grad_norm"], "Gradient Norm", "norm")
        # overfit gap
        if h.get("train_acc") and h.get("val_acc"):
            n = min(len(h["train_acc"]), len(h["val_acc"]))
            gap = [t - v for t, v in zip(h["train_acc"][:n],
                                         h["val_acc"][:n])]
            axes[1, 1].plot(ep[:n], gap)
            axes[1, 1].set_title("Overfit Gap (train-val acc)")
            axes[1, 1].grid(alpha=0.3)
        _plot(axes[1, 2], ["epoch_time"], "Epoch Time", "s")
        fig.tight_layout()
        out = self.log_dir / "training_curves.png"
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out
