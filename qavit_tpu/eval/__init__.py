from qavit_tpu.eval.metrics import (
    best_worst_classes,
    classification_report,
    confusion_matrix,
    evaluate,
    plot_confusion_matrix,
    validate_tta,
    visualize_predictions,
)
from qavit_tpu.eval.tta import make_tta_preprocessors

__all__ = [
    "best_worst_classes", "classification_report", "confusion_matrix",
    "evaluate", "make_tta_preprocessors", "plot_confusion_matrix",
    "validate_tta", "visualize_predictions",
]
