"""Convert a reference PyTorch checkpoint (.pth) into a qavit-tpu orbax
checkpoint.

    python -m qavit_tpu.cli.import_torch --preset hqavit_c100 \
        --torch-checkpoint best_model_ema.pth --out ./checkpoints/imported

Handles the reference's nested dicts ({'model_state_dict': ...} or
{'ema_state_dict': ...}, test_hqa.py:82-104), ``module.``/``_orig_mod.``
prefixes, and the full layout mapping (qavit_tpu/ckpt/torch_import.py).
The result loads with --resume/--init-from and reproduces the reference
model's logits (validated by tests/test_torch_parity.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", required=True)
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--state-key", default=None,
                   help="key of the state dict inside the .pth "
                        "(default: auto: model_state_dict / ema_state_dict "
                        "/ state_dict / raw)")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import torch

    from qavit_tpu.ckpt import save_train_state
    from qavit_tpu.ckpt.torch_import import import_torch_state_dict
    from qavit_tpu.configs import get_preset
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import create_train_state, make_optimizer

    ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    if args.state_key:
        sd = ckpt[args.state_key]
    elif isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif isinstance(ckpt, dict) and "ema_state_dict" in ckpt:
        sd = ckpt["ema_state_dict"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    print(f"loaded {len(sd)} tensors from {args.torch_checkpoint}")

    preset = get_preset(args.preset)
    model, variables = init_model(preset.model, jax.random.PRNGKey(0))
    params, batch_stats = import_torch_state_dict(
        sd, variables["params"], variables.get("batch_stats"))

    tx = make_optimizer(preset.train, 100)
    state = create_train_state(params, tx, batch_stats,
                               use_ema=preset.train.use_ema)
    save_train_state(args.out, state, preset.model, preset.train,
                     {"imported_from": args.torch_checkpoint})
    print(f"wrote orbax checkpoint to {args.out}")


if __name__ == "__main__":
    main()
