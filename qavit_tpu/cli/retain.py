"""Export a slim, git-retainable copy of a training checkpoint.

Usage:
    python -m qavit_tpu.cli.retain checkpoints/<run>/best_model <name>

writes `checkpoints_keep/<name>` — weights-only ({params, batch_stats,
ema_params, ema_batch_stats, bank_count}), about half the size of the
full orbax state, and NOT gitignored. See
qavit_tpu.ckpt.retain_checkpoint for the policy this implements
(flagship best_models were lost twice between rounds; VERDICT r4
weak #5).
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="full checkpoint dir (contains state/)")
    p.add_argument("name", help="destination name under checkpoints_keep/")
    args = p.parse_args(argv)

    from qavit_tpu.ckpt import retain_checkpoint

    dst = f"checkpoints_keep/{args.name}"
    retain_checkpoint(args.src, dst)
    print(f"retained {args.src} -> {dst}")


if __name__ == "__main__":
    main()
