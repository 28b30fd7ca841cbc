"""Grad-CAM parity vs the reference torch pipeline (test_hqa.py:229-319).

Builds the reference torch HQAViT, imports its (randomized) weights, and
compares the NORMALISED pre-colormap CAM produced by
qavit_tpu.interpret.grad_cam against the reference's hook-based
computation (forward hook on ``model.patch_embed.proj``, channel-mean
gradient weights, ReLU, min-max normalise, bilinear upsample) executed
in torch on the same image — the closest possible check to the
``gradcam_hqa/`` artifacts without the reference's trained weights
(none ship in the repo)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
import torch.nn.functional as F  # noqa: E402

from qavit_tpu.ckpt.torch_import import import_torch_state_dict  # noqa: E402
from qavit_tpu.configs import get_preset  # noqa: E402
from qavit_tpu.interpret.gradcam import grad_cam  # noqa: E402
from qavit_tpu.nn import build_model, init_model  # noqa: E402


def _torch_cam(tmodel, img_chw, cls):
    """The reference CAM (test_hqa.py:229-305) up to (excluding) the
    colormap: hook patch_embed.proj, backprop the class score, weights =
    grad.mean(spatial), cam = relu(sum_c w_c act_c), min-max, bilinear
    upsample to HxW."""
    acts, grads = {}, {}

    def fwd_hook(module, inp, out):
        acts["v"] = out
        out.register_hook(lambda g: grads.__setitem__("v", g))

    handle = tmodel.patch_embed.proj.register_forward_hook(fwd_hook)
    tmodel.zero_grad()
    out = tmodel(img_chw.unsqueeze(0))
    out[0, cls].backward()
    handle.remove()

    act = acts["v"].detach()                       # [1, C, h, w]
    grad = grads["v"].detach()
    weights = grad.mean(dim=(2, 3), keepdim=True)
    cam = F.relu((weights * act).sum(dim=1, keepdim=True))
    cam = cam.squeeze()
    if cam.max() == cam.min():
        cam = torch.zeros_like(cam)
    else:
        cam = (cam - cam.min()) / (cam.max() - cam.min())
    h_in, w_in = img_chw.shape[1], img_chw.shape[2]
    cam = F.interpolate(cam[None, None], size=(h_in, w_in),
                        mode="bilinear", align_corners=False)
    return cam.squeeze().numpy()


@pytest.mark.slow
def test_gradcam_matches_reference_pipeline():
    import HQAViT_CIFAR100 as ref

    torch.manual_seed(0)
    tcfg = ref.HQAViTConfig()
    tmodel = ref.HQAViT(tcfg).eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)

    cfg = get_preset("hqavit_c100").model.replace(dtype="float32")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    params, batch_stats = import_torch_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        variables["params"], variables.get("batch_stats"))
    variables = {"params": params, "batch_stats": batch_stats}
    model = build_model(cfg)

    rng = np.random.RandomState(3)
    img = rng.randn(32, 32, 3).astype(np.float32) * 0.5

    # fixed class: with random weights argmax can differ by float noise
    cls = 17
    cam_jax, _ = grad_cam(model, variables, jnp.asarray(img),
                          class_idx=cls)
    cam_ref = _torch_cam(tmodel,
                         torch.from_numpy(img.transpose(2, 0, 1)), cls)

    assert cam_jax.shape == cam_ref.shape == (32, 32)
    # both normalised to [0,1]; bf16-free fp32 end to end
    np.testing.assert_allclose(cam_jax, cam_ref, atol=5e-3)
