"""Host-side dataset sources.

Reads the standard on-disk formats the reference's torchvision loaders use
(SURVEY.md §2.6) directly with numpy — no torch in the input path:

* CIFAR-10 / CIFAR-100 python-pickle batches (``cifar-10-batches-py``,
  ``cifar-100-python``) as downloaded by torchvision (QAViT.py:728).
* STL-10 binary files (``stl10_binary``) incl. the unlabeled split for
  SimCLR (HQAViT_Tiny_stl10.py:160).
* Tiny-ImageNet directory tree with ``val_annotations.txt`` parsing
  (HQAViT_IN_Tiny.py:135-221; the auto-download at :151-171 is gated on an
  allow_download flag since this environment has no egress).

If the files are absent, a deterministic synthetic set with class-dependent
statistics is generated so tests/benchmarks run hermetically (clearly
labelled via ``Dataset.synthetic``).
"""

from __future__ import annotations

import os
import pickle
import zipfile
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

# per-dataset normalisation stats, as hard-coded in the reference trainers
STATS = {
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2470, 0.2435, 0.2616)),
    "cifar100": ((0.5071, 0.4867, 0.4408), (0.2675, 0.2565, 0.2761)),
    "stl10": ((0.4467, 0.4398, 0.4066), (0.2603, 0.2566, 0.2713)),
    "tiny_imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    # procedurally generated fallback dataset (see qavit_tpu/data/procgen.py)
    "proc100": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
    "proc10": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
    "proc_stl": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
    "proc_tin": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
}


@dataclass
class Dataset:
    """In-memory image classification dataset (images uint8 NHWC)."""

    name: str
    train_images: np.ndarray
    train_labels: np.ndarray
    test_images: np.ndarray
    test_labels: np.ndarray
    num_classes: int
    synthetic: bool = False
    class_names: Optional[list] = None


def _synthetic(name: str, img_size: int, num_classes: int,
               n_train: int = 2048, n_test: int = 512) -> Dataset:
    rng = np.random.RandomState(0)

    def make(n):
        labels = rng.randint(0, num_classes, n).astype(np.int32)
        base = rng.randint(0, 255, (n, img_size, img_size, 3))
        # class-dependent shift so models can actually fit the data
        shift = (labels[:, None, None, None] * 255 // num_classes)
        imgs = ((base + shift) // 2).astype(np.uint8)
        return imgs, labels

    tr_x, tr_y = make(n_train)
    te_x, te_y = make(n_test)
    return Dataset(name, tr_x, tr_y, te_x, te_y, num_classes, synthetic=True)


def _load_cifar(root: str, variant: int) -> Optional[Dataset]:
    root = Path(root)
    if variant == 100:
        base = root / "cifar-100-python"
        files = [("train", "fine_labels")], [("test", "fine_labels")]
        if not (base / "train").exists():
            return None
        train_files = [base / "train"]
        test_files = [base / "test"]
        label_key = b"fine_labels"
    else:
        base = root / "cifar-10-batches-py"
        if not (base / "data_batch_1").exists():
            return None
        train_files = [base / f"data_batch_{i}" for i in range(1, 6)]
        test_files = [base / "test_batch"]
        label_key = b"labels"

    def read(paths):
        xs, ys = [], []
        for p in paths:
            with open(p, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.append(np.asarray(d[label_key], np.int32))
        x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return np.ascontiguousarray(x), np.concatenate(ys)

    tr_x, tr_y = read(train_files)
    te_x, te_y = read(test_files)
    return Dataset(f"cifar{variant}", tr_x, tr_y, te_x, te_y, variant)


def _load_stl10(root: str, split: str = "train") -> Optional[Dataset]:
    base = Path(root) / "stl10_binary"
    if not (base / "train_X.bin").exists():
        return None

    def read_images(p):
        raw = np.fromfile(p, np.uint8).reshape(-1, 3, 96, 96)
        # STL-10 stores images column-major: transpose H/W
        return raw.transpose(0, 3, 2, 1)

    def read_labels(p):
        return (np.fromfile(p, np.uint8).astype(np.int32) - 1)

    if split == "unlabeled":
        x = read_images(base / "unlabeled_X.bin")
        y = np.zeros(len(x), np.int32)
        te_x = read_images(base / "test_X.bin")
        te_y = read_labels(base / "test_y.bin")
        return Dataset("stl10_unlabeled", x, y, te_x, te_y, 10)
    tr_x = read_images(base / "train_X.bin")
    tr_y = read_labels(base / "train_y.bin")
    te_x = read_images(base / "test_X.bin")
    te_y = read_labels(base / "test_y.bin")
    return Dataset("stl10", tr_x, tr_y, te_x, te_y, 10)


def _load_tiny_imagenet(root: str) -> Optional[Dataset]:
    base = Path(root) / "tiny-imagenet-200"
    if not (base / "wnids.txt").exists():
        zf = Path(root) / "tiny-imagenet-200.zip"
        if zf.exists():
            with zipfile.ZipFile(zf) as z:
                z.extractall(root)
        else:
            return None
    from PIL import Image

    wnids = [l.strip() for l in open(base / "wnids.txt") if l.strip()]
    cls_idx = {w: i for i, w in enumerate(sorted(wnids))}

    def load_img(p):
        return np.asarray(Image.open(p).convert("RGB"), np.uint8)

    tr_x, tr_y = [], []
    for wnid in sorted(wnids):
        img_dir = base / "train" / wnid / "images"
        for img in sorted(img_dir.glob("*.JPEG")):
            tr_x.append(load_img(img))
            tr_y.append(cls_idx[wnid])

    te_x, te_y = [], []
    ann = base / "val" / "val_annotations.txt"
    for line in open(ann):
        parts = line.strip().split("\t")
        if len(parts) >= 2:
            te_x.append(load_img(base / "val" / "images" / parts[0]))
            te_y.append(cls_idx[parts[1]])

    return Dataset("tiny_imagenet", np.stack(tr_x),
                   np.asarray(tr_y, np.int32), np.stack(te_x),
                   np.asarray(te_y, np.int32), 200)


def _load_proc100(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc100

    tr_x, tr_y, te_x, te_y = load_or_generate_proc100(root)
    # generated, but a real learning task (not the `synthetic` fallback):
    # train/test are disjoint draws from one class-conditional process
    return Dataset("proc100", tr_x, tr_y, te_x, te_y, 100)


def _load_proc100_hard(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc100_hard

    tr_x, tr_y, te_x, te_y = load_or_generate_proc100_hard(root)
    return Dataset("proc100_hard", tr_x, tr_y, te_x, te_y, 100)


def _load_proc10(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc10

    tr_x, tr_y, te_x, te_y = load_or_generate_proc10(root)
    return Dataset("proc10", tr_x, tr_y, te_x, te_y, 10)


def _load_proc_stl(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc_stl

    tr_x, tr_y, te_x, te_y = load_or_generate_proc_stl(root)
    return Dataset("proc_stl", tr_x, tr_y, te_x, te_y, 100)


def _load_proc224(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc224

    tr_x, tr_y, te_x, te_y = load_or_generate_proc224(root)
    return Dataset("proc224", tr_x, tr_y, te_x, te_y, 100)


def _load_proc_stl50k(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc_stl50k

    tr_x, tr_y, te_x, te_y = load_or_generate_proc_stl50k(root)
    return Dataset("proc_stl50k", tr_x, tr_y, te_x, te_y, 100)


def _load_proc_tin(root: str) -> Dataset:
    from qavit_tpu.data.procgen import load_or_generate_proc_tin

    tr_x, tr_y, te_x, te_y = load_or_generate_proc_tin(root)
    return Dataset("proc_tin", tr_x, tr_y, te_x, te_y, 200)


def subsample_per_class(ds: Dataset, k: int) -> Dataset:
    """Label-scarce protocol: keep the first ``k`` occurrences of each
    class (in dataset order) so every arm of a pretrain-vs-scratch
    comparison sees the SAME labeled subset.  Reference analogue: STL-10
    trains on 500 labels/class against 100k unlabeled images."""
    import dataclasses

    y = np.asarray(ds.train_labels)
    order = np.argsort(y, kind="stable")
    starts = np.unique(y[order], return_index=True)[1][1:]
    keep = np.sort(np.concatenate(
        [idx[:k] for idx in np.split(order, starts)]))
    return dataclasses.replace(ds, train_images=ds.train_images[keep],
                               train_labels=ds.train_labels[keep])


def load_dataset(name: str, data_root: str = "./data",
                 allow_synthetic: bool = True) -> Dataset:
    """Load a dataset by base name ('cifar10', 'cifar100', 'stl10',
    'stl10_unlabeled', 'tiny_imagenet', 'proc100', 'proc10')."""
    loaders = {
        "cifar10": lambda: _load_cifar(data_root, 10),
        "cifar100": lambda: _load_cifar(data_root, 100),
        "stl10": lambda: _load_stl10(data_root, "train"),
        "stl10_unlabeled": lambda: _load_stl10(data_root, "unlabeled"),
        "tiny_imagenet": lambda: _load_tiny_imagenet(data_root),
        "proc100": lambda: _load_proc100(data_root),
        "proc100_hard": lambda: _load_proc100_hard(data_root),
        "proc10": lambda: _load_proc10(data_root),
        "proc_stl": lambda: _load_proc_stl(data_root),
        "proc_stl50k": lambda: _load_proc_stl50k(data_root),
        "proc_tin": lambda: _load_proc_tin(data_root),
        "proc224": lambda: _load_proc224(data_root),
    }
    sizes = {"cifar10": (32, 10), "cifar100": (32, 100),
             "stl10": (96, 10), "stl10_unlabeled": (96, 10),
             "tiny_imagenet": (64, 200), "proc100": (32, 100), "proc100_hard": (32, 100),
             "proc10": (32, 10), "proc_stl": (96, 100),
             "proc_stl50k": (96, 100),
             "proc_tin": (64, 200), "proc224": (224, 100)}
    if name not in loaders:
        raise KeyError(f"unknown dataset {name!r}")
    ds = loaders[name]()
    if ds is None:
        if not allow_synthetic:
            raise FileNotFoundError(
                f"dataset {name} not found under {data_root}")
        img, ncls = sizes[name]
        ds = _synthetic(name, img, ncls)
    return ds
