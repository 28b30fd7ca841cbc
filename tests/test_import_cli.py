"""End-to-end torch-checkpoint import: reference .pth -> orbax -> logits
parity through the CLI path."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv.datasets = types.ModuleType("torchvision.datasets")
    _tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.datasets"] = _tv.datasets
    sys.modules["torchvision.transforms"] = _tv.transforms

sys.path.insert(0, "/root/reference")


@pytest.mark.slow
def test_import_torch_cli_roundtrip(tmp_path):
    import HQAViT_CIFAR100 as ref
    import jax
    import jax.numpy as jnp

    from qavit_tpu.ckpt import restore_train_state
    from qavit_tpu.cli.import_torch import main as import_main
    from qavit_tpu.configs import get_preset
    from qavit_tpu.nn import init_model
    from qavit_tpu.train import create_train_state, make_optimizer

    torch.manual_seed(1)
    tmodel = ref.HQAViT(ref.HQAViTConfig()).eval()
    pth = tmp_path / "ref.pth"
    torch.save({"model_state_dict": tmodel.state_dict(),
                "epoch": 42, "val_acc": 72.65}, pth)

    out = tmp_path / "imported"
    import_main(["--preset", "hqavit_c100", "--torch-checkpoint", str(pth),
                 "--out", str(out)])

    preset = get_preset("hqavit_c100")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))
    tx = make_optimizer(preset.train, 10)
    template = create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"),
                                  use_ema=preset.train.use_ema)
    state, meta = restore_train_state(out, template)
    assert meta["metrics"]["imported_from"] == str(pth)

    x = np.random.RandomState(7).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False, bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=2e-3,
                               rtol=1e-3)
