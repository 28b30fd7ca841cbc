"""Orbax checkpointing with true step-level resume.

The reference only ever torch.save's nested dicts and re-loads them for
eval/transfer — no run ever resumes optimizer state (SURVEY.md §5.4).
Here the full TrainState {params, opt_state, batch_stats, EMA, bank
counter, step} plus both configs round-trips through orbax, giving real
preemption-safe resume; best/best_ema/periodic retention mirrors the
reference's file layout (HQAViT_CIFAR100.py:1687-1741).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.train.state import TrainState


def _to_pytree(state: TrainState) -> Dict[str, Any]:
    d = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "bank_count": state.bank_count,
        "ema_decay": state.ema_decay,
    }
    if state.ema_params is not None:
        d["ema_params"] = state.ema_params
        d["ema_batch_stats"] = state.ema_batch_stats
    return d


def save_train_state(path: str, state: TrainState,
                     model_config: Optional[ModelConfig] = None,
                     train_config: Optional[TrainingConfig] = None,
                     metrics: Optional[Dict[str, float]] = None) -> None:
    """Save a full training checkpoint (configs serialised alongside, as
    the reference embeds them in the .pth dicts, test_hqa.py:62-74)."""
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        # force=True: best/best_ema checkpoints are overwritten every time
        # the metric improves (HQAViT_CIFAR100.py:1687-1721 semantics)
        ckptr.save(path / "state", _to_pytree(state), force=True)
    meta = {"metrics": metrics or {},
            # structure manifest: lets restore build a full typed template
            # in ONE data restore (see restore_train_state)
            "state_keys": sorted(_to_pytree(state).keys())}
    if model_config is not None:
        meta["model_config"] = model_config.to_dict()
    if train_config is not None:
        meta["train_config"] = train_config.to_dict()
    (path / "meta.json").write_text(json.dumps(meta, indent=2))


def restore_train_state(path: str, template: TrainState
                        ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a checkpoint and merge into ``template``.

    Restores as-saved (no structural template) so a with-EMA checkpoint
    loads into a no-EMA state and vice versa; opt_state is restored
    structurally against the template (optax state is a custom pytree).
    """
    path = Path(path).resolve()
    tpl = _to_pytree(template)
    meta_file = path / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}

    with ocp.StandardCheckpointer() as ckptr:
        saved_keys = meta.get("state_keys")
        if saved_keys is None:
            # legacy checkpoint without a manifest: learn the structure
            # with an extra as-saved restore
            restored = ckptr.restore(path / "state")
            saved_keys = sorted(restored.keys())
        # ONE typed data restore: template subtrees are used where the
        # state shares them (opt_state is a custom optax pytree and NEEDS
        # its typed structure); a checkpoint-side EMA loading into a
        # no-EMA template borrows the params/batch_stats structure
        restore_tpl = {}
        for k in saved_keys:
            if k in tpl:
                restore_tpl[k] = tpl[k]
            elif k == "ema_params":
                restore_tpl[k] = tpl["params"]
            elif k == "ema_batch_stats":
                restore_tpl[k] = tpl["batch_stats"]
            else:
                raise KeyError(f"unknown checkpoint subtree {k!r}")
        restored = ckptr.restore(path / "state", restore_tpl)
    has_ema = template.ema_params is not None

    def as_tree(x):
        return jax.tree.map(jax.numpy.asarray, x)

    # slim retained checkpoints (retain_checkpoint) drop opt_state /
    # step / ema_decay — fall back to the template's values for those
    state = template.replace(
        step=jax.numpy.asarray(restored.get("step", template.step)),
        params=as_tree(restored["params"]),
        opt_state=restored.get("opt_state", template.opt_state),
        batch_stats=as_tree(restored["batch_stats"]),
        bank_count=jax.numpy.asarray(restored["bank_count"]),
        ema_decay=jax.numpy.asarray(restored.get("ema_decay",
                                                 template.ema_decay)),
        ema_params=(as_tree(restored["ema_params"])
                    if has_ema and "ema_params" in restored
                    else (as_tree(restored["params"]) if has_ema
                          else None)),
        ema_batch_stats=(as_tree(restored.get("ema_batch_stats",
                                              restored["batch_stats"]))
                         if has_ema else None),
    )
    return state, meta


def _restore_numpy(state_dir: Path) -> Dict[str, Any]:
    """Restore a checkpoint entirely as host numpy arrays.

    A plain StandardCheckpointer restore materialises jax.Arrays with
    the *saved* shardings — which fails outright when the checkpoint was
    written on another backend (a TPU-saved flagship restored host-side
    raises `Device TPU v5 lite0 was not found`), and on the remote-TPU
    (axon) backend drags every leaf through the tunnel. Weight transfer
    and retention are host-side operations; numpy is the right target.
    """
    import numpy as np

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(state_dir).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(state_dir, restore_args=restore_args)


def load_for_transfer(path: str, template_params,
                      drop_head="auto",
                      new_grid: Optional[int] = None,
                      simclr: bool = False,
                      template_batch_stats=None,
                      use_ema: bool = False):
    """Load pretrained params for finetuning: optional head drop
    ('head' not in k, HQAViT_Tiny_Cifar10.py:449-453) and positional
    embedding resize (HQAViT_Tiny_stl10.py:250-283).

    ``drop_head`` is True / False / "auto".  "auto" mirrors the two
    reference transfer modes at once: a same-task finetune loads the
    whole state dict head included (HQAViT_C100_Finetune.py:404-408),
    while a new-task transfer filters 'head' keys out — with "auto" the
    head is kept exactly when its shapes match the template.

    Passing ``template_batch_stats`` returns ``(params, batch_stats)``
    with shape-matching BN running stats merged into the template — the
    reference's torch checkpoints carry them inside the state dict, so
    a finetune resumes from calibrated cnn_stem statistics rather than
    fresh ones.

    ``simclr=True`` unwraps the backbone subtree out of a SimCLRNet
    checkpoint (projection head discarded) — the reconstructed analogue
    of the reference's SimCLR->finetune path (logs_stl10_simclr/finetune;
    HQAViT_Tiny_stl10.py:362-420)."""
    from qavit_tpu.nn.layers import resize_pos_embed

    path = Path(path).resolve()
    restored = _restore_numpy(path / "state")
    params = restored["params"]
    if use_ema:
        # the reference finetunes from best_model_ema.pth — the EMA
        # weights become the starting model weights
        # (HQAViT_C100_Finetune.py:404-408)
        if "ema_params" in restored:
            params = restored["ema_params"]
            print("transfer: using EMA weights as the starting params")
        else:
            print("transfer: --init-ema requested but checkpoint has no "
                  "ema_params; falling back to raw params")
    if simclr:
        from qavit_tpu.train.simclr import extract_backbone_params

        params = extract_backbone_params(params)

    if drop_head == "auto":
        def _shapes(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                name = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    out.update(_shapes(v, name))
                elif name.startswith("head"):
                    out[name] = tuple(v.shape)
            return out
        src_head, dst_head = _shapes(params), _shapes(template_params)
        drop_head = src_head != dst_head
        if not drop_head and src_head:
            print("transfer: same-task head shapes match — head kept "
                  "(HQAViT_C100_Finetune.py:404-408 semantics)")

    out = jax.tree.map(lambda x: x, template_params)  # copy structure

    def merge(dst, src, prefix=""):
        for k, v in src.items():
            if k not in dst:
                continue
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                merge(dst[k], v, name)
            else:
                if drop_head and name.startswith("head"):
                    continue
                if name == "pos_embed" and v.shape != dst[k].shape:
                    import math

                    if new_grid is None:
                        new_grid_ = int(math.isqrt(dst[k].shape[1]))
                    else:
                        new_grid_ = new_grid
                    print(f"transfer: bicubic pos_embed resize "
                          f"{tuple(v.shape)} -> {tuple(dst[k].shape)} "
                          f"(grid {math.isqrt(v.shape[1])} -> "
                          f"{new_grid_}, HQAViT_Tiny_stl10.py:250-282)")
                    dst[k] = resize_pos_embed(jax.numpy.asarray(v),
                                              new_grid_).astype(dst[k].dtype)
                    continue
                if v.shape == dst[k].shape:
                    dst[k] = jax.numpy.asarray(v, dst[k].dtype)
        return dst

    merged = merge(out, params)
    if template_batch_stats is not None:
        bn_out = jax.tree.map(lambda x: x, template_batch_stats)
        bstats = (restored.get("ema_batch_stats") if use_ema else None) \
            or restored.get("batch_stats")

        def merge_bn(dst, src):
            for k, v in src.items():
                if k not in dst:
                    continue
                if isinstance(v, dict):
                    merge_bn(dst[k], v)
                elif hasattr(v, "shape") and v.shape == dst[k].shape:
                    dst[k] = jax.numpy.asarray(v, dst[k].dtype)
            return dst

        if bstats:
            merge_bn(bn_out, bstats)
        return merged, bn_out
    return merged


def retain_checkpoint(src: str, dst: str) -> None:
    """Export a slim, git-retainable copy of a training checkpoint.

    `checkpoints/` is gitignored (orbax full states carry optimizer
    moments, ~92 MB/checkpoint) and twice now a flagship `best_model`
    has been lost between rounds, forcing full regenerations (VERDICT r4
    weak #5).  Policy: every flagship run's best_model is exported here
    — weights only ({params, batch_stats, ema_params, ema_batch_stats,
    bank_count}, about half the size, everything `load_for_transfer`
    and evaluation consume; opt_state/step are dropped, so a retained
    checkpoint seeds finetune/transfer/eval but not --resume) — into
    the NON-ignored `checkpoints_keep/` and committed.
    """
    src_p, dst_p = Path(src).resolve(), Path(dst).resolve()
    restored = _restore_numpy(src_p / "state")
    slim = {k: restored[k]
            for k in ("params", "batch_stats", "ema_params",
                      "ema_batch_stats", "bank_count")
            if k in restored and restored[k] is not None}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(dst_p / "state", slim, force=True)
    meta_f = src_p / "meta.json"
    meta = json.loads(meta_f.read_text()) if meta_f.exists() else {}
    meta["state_keys"] = sorted(slim.keys())
    meta["retained_from"] = str(src_p)
    (dst_p / "meta.json").write_text(json.dumps(meta, indent=2))


class CheckpointManager:
    """best / best_ema / periodic retention (HQAViT_CIFAR100.py:1687-1741)."""

    def __init__(self, directory: str, model_config: ModelConfig,
                 train_config: TrainingConfig, save_freq: int = 10):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.mc = model_config
        self.tc = train_config
        self.save_freq = save_freq
        self.best_acc = 0.0
        self.best_ema_acc = 0.0

    def maybe_save(self, state: TrainState, epoch: int, val_acc: float,
                   ema_val_acc: Optional[float] = None) -> Dict[str, bool]:
        saved = {"best": False, "best_ema": False, "periodic": False}
        if val_acc > self.best_acc:
            self.best_acc = val_acc
            save_train_state(self.dir / "best_model", state, self.mc,
                             self.tc, {"epoch": epoch, "val_acc": val_acc})
            saved["best"] = True
        if ema_val_acc is not None and ema_val_acc > self.best_ema_acc:
            self.best_ema_acc = ema_val_acc
            save_train_state(self.dir / "best_model_ema", state, self.mc,
                             self.tc,
                             {"epoch": epoch, "ema_val_acc": ema_val_acc})
            saved["best_ema"] = True
        if self.save_freq and epoch % self.save_freq == 0:
            save_train_state(self.dir / f"checkpoint_epoch_{epoch}", state,
                             self.mc, self.tc, {"epoch": epoch})
            saved["periodic"] = True
        return saved
