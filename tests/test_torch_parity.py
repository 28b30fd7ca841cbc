"""Numerical parity vs the reference PyTorch implementation.

Loads the reference module read-only from /root/reference (never copied),
builds the torch HQAViT / QAViT at the flagship configs, imports its
state_dict through qavit_tpu.ckpt.torch_import, and compares eval-mode
logits (fp32).  This validates every layer's math end to end —
tolerance-based per SURVEY.md §7 hard part 4.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference trainers import torchvision (absent here) at module top for
# their data loaders; the model classes never touch it — stub it out
import types  # noqa: E402

if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv.datasets = types.ModuleType("torchvision.datasets")
    _tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.datasets"] = _tv.datasets
    sys.modules["torchvision.transforms"] = _tv.transforms

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qavit_tpu.ckpt.torch_import import import_torch_state_dict  # noqa: E402
from qavit_tpu.configs import get_preset  # noqa: E402
from qavit_tpu.nn import init_model  # noqa: E402



def _randomize(tmodel):
    """Perturb every parameter and BN stat so layout bugs can't hide
    behind constant-initialised tensors (LN scales, gammas, zeros)."""
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
        for name, b in tmodel.named_buffers():
            if "running_mean" in name:
                b.add_(torch.randn(b.shape, generator=g) * 0.1)
            elif "running_var" in name:
                b.mul_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)


@pytest.mark.slow
def test_hqavit_logits_parity():
    import HQAViT_CIFAR100 as ref

    torch.manual_seed(0)
    tcfg = ref.HQAViTConfig()
    tmodel = ref.HQAViT(tcfg).eval()
    _randomize(tmodel)

    preset = get_preset("hqavit_c100")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))

    params, batch_stats = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"], variables.get("batch_stats"))

    x = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()

    ours, _ = model.apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(x), train=False, bank_count=0)
    ours = np.asarray(ours)

    np.testing.assert_allclose(ours, ref_logits, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_qavit_extreme_logits_parity():
    import QAViTV2_EXTREME as ref

    torch.manual_seed(0)
    tcfg = ref.QAViTConfig()
    tmodel = ref.QAViT(tcfg).eval()
    _randomize(tmodel)

    preset = get_preset("qavit_v2_extreme")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))

    params, _ = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"])

    x = np.random.RandomState(1).randn(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()

    ours, _ = model.apply({"params": params}, jnp.asarray(x), train=False,
                          bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=2e-3,
                               rtol=1e-3)


@pytest.mark.slow
def test_hqavit_v2_stem_logits_parity():
    import HQAViTv2_CIFAR100 as ref

    torch.manual_seed(0)
    tmodel = ref.HQAViT(ref.HQAViTConfig()).eval()
    _randomize(tmodel)

    preset = get_preset("hqavit_v2_c100")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))

    params, batch_stats = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"], variables.get("batch_stats"))

    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    ours, _ = model.apply(v, jnp.asarray(x), train=False, bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=2e-3,
                               rtol=1e-3)


@pytest.mark.slow
def test_hqavit_tiny_in_logits_parity():
    import HQAViT_IN_Tiny as ref

    torch.manual_seed(0)
    tmodel = ref.HQAViT(ref.HQAViTConfig()).eval()
    _randomize(tmodel)

    preset = get_preset("hqavit_tiny_in")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))

    params, batch_stats = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"], variables.get("batch_stats"))

    x = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = model.apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(x), train=False, bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=3e-3,
                               rtol=1e-3)


@pytest.mark.slow
def test_qavit_224_v1_logits_and_bank_parity():
    """QAViT v1 @224 (QAViT.py:654) — the last §2.8 row without torch
    parity (VERDICT r2 #2).  Covers the v1 bank semantics no other test
    touches (rate 0.01, update clamp ±0.1, value clamp ±1.0, no warmup —
    QAViT.py:216-224): logits at eval, then bank K/V after ONE
    deterministic train-mode forward (dropout/drop-path 0)."""
    import QAViT as ref

    torch.manual_seed(0)
    tcfg = ref.QAViTConfig(dropout=0.0, drop_path=0.0)
    tmodel = ref.QAViT(tcfg).eval()
    _randomize(tmodel)

    preset = get_preset("qavit_224_v1")
    mc = preset.model.replace(dtype="float32", dropout=0.0, drop_path=0.0)
    model, variables = init_model(mc, jax.random.PRNGKey(0))
    params, _ = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"])

    x = np.random.RandomState(4).randn(2, 224, 224, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_logits = tmodel(xt).numpy()
    ours, _ = model.apply({"params": params}, jnp.asarray(x), train=False,
                          bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=2e-3,
                               rtol=1e-3)

    # v1 bank write parity: torch mutates global_k/global_v in-place
    # during a training forward; our functional carry must land on the
    # same values
    tmodel.train()
    with torch.no_grad():
        tmodel(xt)
    bank_k_t = tmodel.global_bank.global_k.detach().numpy()
    bank_v_t = tmodel.global_bank.global_v.detach().numpy()
    (_, bank), _ = model.apply(
        {"params": params}, jnp.asarray(x), train=True, bank_count=0,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(bank.k), bank_k_t, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bank.v), bank_v_t, atol=1e-4,
                               rtol=1e-4)
    # the write must actually have moved the bank
    assert np.abs(bank_k_t - params["global_bank"]["global_k"]).max() > 0


@pytest.mark.slow
def test_qavit_v2_224_logits_parity():
    """QAViTv2 @224 (QAViTv2.py:1011): stabilised dwconv/CCFFFN at the
    196-token geometry (VERDICT r2 #2)."""
    import QAViTv2 as ref

    torch.manual_seed(0)
    tmodel = ref.QAViT(ref.QAViTConfig()).eval()
    _randomize(tmodel)

    preset = get_preset("qavit_v2")
    mc = preset.model.replace(dtype="float32")
    model, variables = init_model(mc, jax.random.PRNGKey(0))
    params, _ = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"])

    x = np.random.RandomState(5).randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = model.apply({"params": params}, jnp.asarray(x), train=False,
                          bank_count=0)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=2e-3,
                               rtol=1e-3)
