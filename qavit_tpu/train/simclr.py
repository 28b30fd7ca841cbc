"""SimCLR contrastive pretraining — reconstructed pipeline.

The reference repo contains no SimCLR source; only its output logs survive
(logs_stl10_simclr/simclr/training_metrics.json: NT-Xent loss 3.694->1.798
over 7 epochs, LR 0.0141 -> 0.0424 peak with a 5-epoch warmup then cosine,
SURVEY.md §0).  This module rebuilds it from that metadata + standard
SimCLR: two independently-augmented views, a backbone-features + 2-layer
projection head, and the NT-Xent (normalised temperature-scaled cross
entropy) loss.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from qavit_tpu.configs.model import ModelConfig
from qavit_tpu.configs.training import TrainingConfig
from qavit_tpu.nn.models import build_model
from qavit_tpu.train.state import TrainState, swap_bank


class SimCLRNet(nn.Module):
    """Backbone features + projection MLP (proj_dim=128, hidden=embed)."""

    cfg: ModelConfig
    proj_dim: int = 128
    pmean_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bank_count=0):
        backbone = build_model(self.cfg, self.pmean_axis)
        feats, bank = backbone(x, train=train, bank_count=bank_count,
                               return_features=True)
        h = nn.Dense(self.cfg.embed_dim, name="proj_fc1")(feats)
        h = nn.relu(h)
        z = nn.Dense(self.proj_dim, name="proj_fc2")(h)
        return z, bank


def nt_xent_loss(z: jax.Array, temperature: float = 0.5) -> jax.Array:
    """NT-Xent over 2B projections ordered [view1; view2]."""
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    n = z.shape[0]
    b = n // 2
    sim = (z @ z.T) / temperature
    sim = sim - 1e9 * jnp.eye(n)                    # mask self-similarity
    # positive of i is i+b (mod n)
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -logp[jnp.arange(n), pos_idx].mean()


def make_simclr_train_step(model: SimCLRNet, tx, tc: TrainingConfig,
                           temperature: float = 0.5,
                           schedule: Optional[Callable] = None,
                           jit: bool = True):
    """train_step(state, view1, view2, rng) -> (state, metrics).

    Views are already augmented (two calls to augment_batch with distinct
    rngs); the forward runs on the concatenated 2B batch so the bank sees
    both views.
    """

    def train_step(state: TrainState, view1, view2, rng):
        rng = jax.random.fold_in(rng, state.step)
        images = jnp.concatenate([view1, view2], axis=0)
        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, images, train=True,
                              bank_count=state.bank_count,
                              rngs={"dropout": rng},
                              mutable=["batch_stats"] if has_bn else False)
            if has_bn:
                (z, bank), mut = out
                new_bs = mut["batch_stats"]
            else:
                (z, bank) = out
                new_bs = state.batch_stats
            return nt_xent_loss(z, temperature), (bank, new_bs)

        (loss, (bank, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        params = swap_bank(state.params, bank)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=opt_state,
                                  batch_stats=new_bs,
                                  bank_count=bank.count)
        return new_state, metrics

    if jit:
        train_step = jax.jit(train_step)
    return train_step


def extract_backbone_params(simclr_params) -> dict:
    """Pull the backbone subtree out of SimCLR params for transfer into a
    supervised model (the reconstructed finetune path)."""
    scope = ("HQAViT_0" if "HQAViT_0" in simclr_params
             else "QAViT_0" if "QAViT_0" in simclr_params else None)
    if scope is None:
        raise KeyError(f"no backbone scope in {list(simclr_params)}")
    return simclr_params[scope]
