"""Dataset downloaders (for environments with network egress).

The reference relies on torchvision's downloaders plus a custom
Tiny-ImageNet fetch (HQAViT_IN_Tiny.py:151-171).  This module fetches the
same canonical archives with stdlib urllib so the framework has no
torchvision dependency; in egress-less environments it fails cleanly and
qavit_tpu.data.load_dataset falls back to synthetic data.

    python -m qavit_tpu.data.download --dataset cifar100 --root ./data
"""

from __future__ import annotations

import argparse
import sys
import tarfile
import zipfile
from pathlib import Path

URLS = {
    "cifar10": "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
    "cifar100": "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
    "stl10": "http://ai.stanford.edu/~acoates/stl10/stl10_binary.tar.gz",
    # cs231n mirror, as used by the reference (HQAViT_IN_Tiny.py:151)
    "tiny_imagenet": "http://cs231n.stanford.edu/tiny-imagenet-200.zip",
}


def download(dataset: str, root: str = "./data") -> Path:
    if dataset not in URLS:
        raise KeyError(f"unknown dataset {dataset!r}; known: {sorted(URLS)}")
    import urllib.request

    root_p = Path(root)
    root_p.mkdir(parents=True, exist_ok=True)
    url = URLS[dataset]
    archive = root_p / url.rsplit("/", 1)[1]
    if not archive.exists():
        print(f"downloading {url} -> {archive}")
        urllib.request.urlretrieve(url, archive)  # noqa: S310
    print(f"extracting {archive}")
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(root_p)
    else:
        with tarfile.open(archive) as t:
            t.extractall(root_p)
    return root_p


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=sorted(URLS))
    p.add_argument("--root", default="./data")
    args = p.parse_args(argv)
    try:
        download(args.dataset, args.root)
    except Exception as e:  # noqa: BLE001
        print(f"download failed ({e}); if this environment has no egress, "
              f"place the extracted files under {args.root} manually",
              file=sys.stderr)
        raise


if __name__ == "__main__":
    main()
