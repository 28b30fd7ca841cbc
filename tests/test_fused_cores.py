"""Mosaic-lowerable cores (kernels/fused_cores.py) and the Pallas unit
runner (kernels/fused_pallas.py): parity vs the jnp twins and end-to-end
interpret-mode execution of the real kernels on CPU (VERDICT r1 #2/#3 —
the fused-block kernel must be exercised in CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qavit_tpu.configs import get_preset
from qavit_tpu.kernels import fused_cores as C
from qavit_tpu.kernels import fused_ref as R
from qavit_tpu.kernels.fused_ref import make_geom


@pytest.fixture(scope="module")
def flagship_geom():
    return make_geom(get_preset("hqavit_c100").model)


def _dense_p(key, fin, fout):
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.normal(k1, (fin, fout)) * 0.05,
            "bias": jax.random.normal(k2, (fout,)) * 0.01}


def _ln_p(key, f):
    return {"scale": 1 + 0.1 * jax.random.normal(key, (f,)),
            "bias": 0.01 * jax.random.normal(key, (f,))}


@pytest.fixture(scope="module")
def block_params(flagship_geom):
    """Full explicit block param tree at flagship geometry + inputs."""
    return _make_block_params(flagship_geom,
                              get_preset("hqavit_c100").model)


def _make_block_params(g, cfg):
    """Explicit block param tree + inputs at any fused geometry."""
    c = g.c
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 64))
    nrm = jax.random.normal
    p = {
        "norm1": _ln_p(next(ks), c),
        "swa": {"qkv": _dense_p(next(ks), c, 3 * c),
                "proj": _dense_p(next(ks), c, c),
                "norm": _ln_p(next(ks), c),
                "linformer": {
                    "E_k": 0.02 * nrm(next(ks), (g.ws2, g.lin_k)),
                    "E_v": 0.02 * nrm(next(ks), (g.ws2, g.lin_k))}},
        "msda": {"qkv_kernel": 0.05 * nrm(next(ks), (c, 3 * c)),
                 "qkv_bias": 0.01 * nrm(next(ks), (3 * c,)),
                 "proj": _dense_p(next(ks), c, c),
                 "norm": _ln_p(next(ks), c),
                 "linformer": {
                     "E_k": 0.02 * nrm(next(ks),
                                       (cfg.msda_pad_len, g.lin_k)),
                     "E_v": 0.02 * nrm(next(ks),
                                       (cfg.msda_pad_len, g.lin_k))}},
        "cga": {"q_proj": _dense_p(next(ks), c // g.groups, g.cperg),
                "k_proj": _dense_p(next(ks), c // g.groups, g.cperg),
                "v_proj": _dense_p(next(ks), c // g.groups, g.cperg),
                "bank_k_proj": _dense_p(next(ks), c, g.cperg),
                "bank_v_proj": _dense_p(next(ks), c, g.cperg),
                "proj": _dense_p(next(ks), c // 2, c),
                "norm": _ln_p(next(ks), c)},
        "cross_attn": {"q_proj": _dense_p(next(ks), c, c),
                       "k_proj": _dense_p(next(ks), c, c),
                       "v_proj": _dense_p(next(ks), c, c),
                       "proj": _dense_p(next(ks), c, c)},
        "fusion": {"fusion_weights": jnp.ones((4,))},
        "bottleneck_mlp": {
            "fc1": _dense_p(next(ks), 4 * g.d_c, g.bottleneck_hidden),
            "fc2": _dense_p(next(ks), g.bottleneck_hidden, c)},
        "norm2": _ln_p(next(ks), c),
        "ccf_ffn": {
            "fc1": _dense_p(next(ks), c, g.ccf_hidden),
            "dwconv_norm": _ln_p(next(ks), g.ccf_hidden),
            "dwconv": {"dwconv": {"kernel": 0.05 * nrm(
                next(ks), (3, 3, 1, g.ccf_hidden))},
                "scale": 0.1 * jnp.ones((g.ccf_hidden,))},
            "post_dwconv_norm": _ln_p(next(ks), g.ccf_hidden),
            "fc2": _dense_p(next(ks), g.ccf_hidden, c),
            "gamma": 0.1 * jnp.ones((1,))},
    }
    for name in ("swa", "msda", "cga", "cross"):
        p[f"norm_{name}"] = _ln_p(next(ks), c)
        p[f"compress_{name}"] = _dense_p(next(ks), c, g.d_c)
    return {
        "p": p,
        "xn": nrm(next(ks), (16, g.n, c)),
        "bank_k": nrm(next(ks), (1, g.bank_s, c)),
        "bank_v": nrm(next(ks), (1, g.bank_s, c)),
    }


def _bank_heads(bp, g):
    def split(arr):
        return arr[0].reshape(g.bank_s, g.heads, g.d).transpose(1, 0, 2)
    return {"k_heads": split(bp["bank_k"]), "v_heads": split(bp["bank_v"])}


def _bank_full(bp):
    return {"k_full": bp["bank_k"][0], "v_full": bp["bank_v"][0]}


def _run_bd(branch, prep, bp, g, G, rng):
    if branch == "swa":
        return C.swa_bd(prep["swa"], bp["xn"], _bank_heads(bp, g), g, G,
                        jnp.float32, rng)
    if branch == "msda":
        return C.msda_bd(prep["msda"], bp["xn"], _bank_heads(bp, g), g,
                         G, jnp.float32, rng)
    if branch == "cga":
        return C.cga_bd(prep["cga"], bp["xn"], bp["bank_k"][0],
                        bp["bank_v"][0], g, G, jnp.float32, rng)
    return C.cross_bd(prep["cross"], bp["xn"], _bank_full(bp), g, G,
                      jnp.float32, rng)


def _run_ref(branch, bp, g, masks=(None, None)):
    refs = {"swa": R.swa_ref, "msda": R.msda_ref, "cga": R.cga_ref,
            "cross": R.cross_ref}
    key = {"cross": "cross_attn"}.get(branch, branch)
    return refs[branch](bp["p"][key], bp["xn"], bp["bank_k"],
                        bp["bank_v"], g, jnp.float32, masks=masks)


@pytest.mark.parametrize("branch", ["swa", "msda", "cga", "cross"])
def test_bd_core_matches_ref_flagship(flagship_geom, block_params,
                                      branch):
    """Prepped-weight block-diagonal rewrite == jnp twin at flagship
    geometry (the -inf off-diagonal blocks softmax to exact zeros)."""
    g = flagship_geom
    G = C.pick_group(16)
    prep = C.prep_block(block_params["p"], g, G)
    r = _run_ref(branch, block_params, g)
    b = _run_bd(branch, prep, block_params, g, G, C.NullRng())
    for got, want in zip(jax.tree_util.tree_leaves(b),
                         jax.tree_util.tree_leaves(r)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_tail_bd_matches_ref(flagship_geom, block_params):
    g = flagship_geom
    bp = block_params
    prep = C.prep_block(bp["p"], g, C.pick_group(16))
    outs = tuple(jax.random.normal(jax.random.PRNGKey(50 + i),
                                   (16, g.n, g.c)) for i in range(4))
    xc = jax.random.normal(jax.random.PRNGKey(60), (16, g.n, g.c))
    want = R.tail_ref(bp["p"], xc, outs, g, jnp.float32)
    got = C.tail_bd(prep["tail"], xc, outs, g, jnp.float32, C.NullRng())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bd_core_matches_ref_with_dropout(flagship_geom, block_params):
    """The HostRng provider threads the twin's mask realizations through
    the block-diagonal layout (off-diagonal mask values are no-ops on
    exact-zero probs)."""
    g = flagship_geom
    bp = block_params
    G = C.pick_group(16)
    prep = C.prep_block(bp["p"], g, G)
    masks = R.make_block_masks(jax.random.PRNGKey(3), 16, g, 0.1, True)
    rng = C.HostRng(masks, g, G)
    for branch, mk in [("swa", ("swa_attn", "swa_proj")),
                       ("cga", ("cga_attn", "cga_proj"))]:
        r = _run_ref(branch, bp, g, masks=(masks[mk[0]], masks[mk[1]]))
        b = _run_bd(branch, prep, bp, g, G, rng)
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(r[0]),
                                   rtol=2e-5, atol=2e-5)


def test_bd_core_dropout_parity_multiwindow():
    """HostRng at a MULTI-WINDOW geometry (qavit_v2_c100: n=64, nw=4):
    the window-major mask expansion (`_swa_expand`) and the swa_proj
    window-reverse reorder reproduce the windowed twin's dropout
    realizations in the block-diagonal layout (ADVICE r2 low — was
    only exercised at nw==1)."""
    cfg = get_preset("qavit_v2_c100").model
    g = make_geom(cfg)
    assert g is not None and g.nw == 4
    bp = _make_block_params(g, cfg)
    G = C.pick_group(8)
    bp["xn"] = bp["xn"][:8]
    prep = C.prep_block(bp["p"], g, G)
    masks = R.make_block_masks(jax.random.PRNGKey(7), 8, g, 0.1, True)
    rng = C.HostRng(masks, g, G)
    for branch, mk in [("swa", ("swa_attn", "swa_proj")),
                       ("cga", ("cga_attn", "cga_proj")),
                       ("msda", ("msda_attn", "msda_proj"))]:
        r = _run_ref(branch, bp, g, masks=(masks[mk[0]], masks[mk[1]]))
        b = _run_bd(branch, prep, bp, g, G, rng)
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(r[0]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=branch)


def test_dwconv_shift_matches_lax_conv(rng):
    """9-tap shift dwconv == lax.conv_general_dilated (SAME, depthwise)."""
    b, h, w, c = 3, 4, 4, 24
    x = jax.random.normal(rng, (b, h * w, c))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, c))
    got = R.dwconv3x3_ref(x, kernel, (h, w), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x.reshape(b, h, w, c), kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c).reshape(b, h * w, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_interpret_full_model(tiny_cfg, rng):
    """The REAL Pallas kernels (TPU-semantics interpret mode on CPU):
    eval forward, train forward incl. bank evolution, and a gradient —
    all against the flax reference path.  Dropout/drop-path are 0: the
    kernels draw masks from the in-kernel TPU PRNG, so realizations
    cannot match the host-rng twin (rates > 0 are covered on real TPU
    and by the HostRng parity tests above)."""
    import qavit_tpu.kernels.fused_block as FB
    from qavit_tpu.nn import build_model, init_model

    cfg_ref = tiny_cfg.replace(dtype="float32", dropout=0.0,
                               drop_path=0.0)
    cfg_fused = cfg_ref.replace(attn_impl="fused_block")
    _, variables = init_model(cfg_ref, jax.random.PRNGKey(0))
    x = jax.random.normal(rng, (4, 16, 16, 3))

    def run(cfg, force, train):
        model = build_model(cfg)
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            if train:
                out, _ = model.apply(variables, x,
                                     rngs={"dropout": rng},
                                     mutable=["batch_stats"],
                                     train=True, bank_count=0)
                return out
            return model.apply(variables, x, train=False, bank_count=0)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False

    le_ref, _ = run(cfg_fused, False, False)
    le_pal, _ = run(cfg_fused, True, False)
    np.testing.assert_allclose(np.asarray(le_pal), np.asarray(le_ref),
                               rtol=2e-4, atol=2e-5)

    lt_ref, b_ref = run(cfg_fused, False, True)
    lt_pal, b_pal = run(cfg_fused, True, True)
    np.testing.assert_allclose(np.asarray(lt_pal), np.asarray(lt_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b_pal.k), np.asarray(b_ref.k),
                               rtol=1e-5, atol=1e-6)

    def loss(params, force):
        model = build_model(cfg_fused)
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            out, _ = model.apply(dict(variables, params=params), x,
                                 rngs={"dropout": rng},
                                 mutable=["batch_stats"],
                                 train=True, bank_count=0)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False
        return jnp.sum(out[0] ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_pal = jax.grad(lambda p: loss(p, True))(variables["params"])
    for got, want in zip(jax.tree_util.tree_leaves(g_pal),
                         jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-4)
    _assert_bank_read_grads(g_pal, g_ref)


def _assert_bank_read_grads(g_pal, g_ref):
    """ADVICE r2 (high): the fused Pallas path must propagate attention
    READ gradients into global_k/global_v — the torch bank k/v are
    nn.Parameters updated from read-gradients (QAViT.py:183-224), and
    nn/bank.py keeps that contract.  Compared RELATIVELY: the old
    absolute atol let an exactly-zero kernel gradient pass at toy
    scale."""

    def bank_leaves(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = [getattr(p, "key", None) for p in path]
            if "global_bank" in keys and keys[-1] in ("global_k",
                                                      "global_v"):
                out[keys[-1]] = np.asarray(leaf)
        return out

    bp, br = bank_leaves(g_pal), bank_leaves(g_ref)
    assert set(br) == {"global_k", "global_v"}
    for k in ("global_k", "global_v"):
        ref_norm = np.linalg.norm(br[k])
        assert ref_norm > 0, f"reference {k} read-gradient is zero"
        rel = np.linalg.norm(bp[k] - br[k]) / ref_norm
        assert rel < 1e-3, (k, rel, ref_norm)


def test_plan_tiles_group_divides_every_tile():
    """ADVICE r2 #2 regression: G must divide EVERY kernel's tile size
    (batch 72 at the n=64 multi-window geometry picked swa tile 18 with
    G=4 and failed at trace time in bd_mix)."""
    from qavit_tpu.kernels.fused_kernels import plan_tiles

    for preset in ("hqavit_c100", "qavit_v2_c100", "hqavit_tiny_in"):
        g = make_geom(get_preset(preset).model)
        assert g is not None
        for b in (8, 16, 24, 56, 72, 96, 120, 128, 256, 1024):
            tiles, G = plan_tiles(b, g)
            for k, t in tiles.items():
                assert b % t == 0, (preset, b, k, t)
                assert (b // t) % G == 0, (preset, b, k, b // t, G)


def test_fused_interpret_multiwindow_batch72(tiny_plain_cfg, rng):
    """The exact geometry/batch that failed at trace time pre-fix
    (ADVICE r2 #2): multi-window 64-token blocks at batch 72 through the
    real kernels in interpret mode."""
    import qavit_tpu.kernels.fused_block as FB
    from qavit_tpu.nn import build_model, init_model

    cfg_ref = tiny_plain_cfg.replace(
        name="tiny_mw72", img_size=32, dtype="float32", dropout=0.0,
        drop_path=0.0)
    cfg_fused = cfg_ref.replace(attn_impl="fused_block")
    _, variables = init_model(cfg_ref, jax.random.PRNGKey(0))
    x = jax.random.normal(rng, (72, 32, 32, 3))

    def run(force):
        model = build_model(cfg_fused)
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            return model.apply(variables, x, train=False, bank_count=0)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False

    le_ref, _ = run(False)
    le_pal, _ = run(True)
    np.testing.assert_allclose(np.asarray(le_pal), np.asarray(le_ref),
                               rtol=2e-4, atol=2e-5)


def test_counter_rng_mask_statistics():
    """The in-kernel counter-hash RNG (murmur3 finalizer) produces masks
    with the right keep rate and no obvious structure (the realizations
    are arbitrary, the DISTRIBUTION is the contract)."""
    rng = C.PallasRng(0.25, jnp.float32(0.0),
                      (jnp.int32(1234), jnp.int32(567)), 3)
    m = rng.drop("x", (64, 128))
    m = np.asarray(m)
    keep_frac = (m > 0).mean()
    assert abs(keep_frac - 0.75) < 0.02
    np.testing.assert_allclose(m[m > 0], 1.0 / 0.75, rtol=1e-6)
    # different draws decorrelate
    m2 = np.asarray(rng.drop("x", (64, 128)))
    agree = ((m > 0) == (m2 > 0)).mean()
    assert 0.5 < agree < 0.75  # ~ p^2 + (1-p)^2 = 0.625
    # per-sample drop_path keep rate
    rng2 = C.PallasRng(0.0, jnp.float32(0.3),
                       (jnp.int32(9), jnp.int32(8)), 0)
    dp = np.asarray(rng2.drop_path("d", 4096))
    assert abs((dp > 0).mean() - 0.7) < 0.03


def test_multiwindow_swa_bd_matches_twin():
    """Multi-window SWA (64 tokens, 4 windows of 16): the
    window-structured mix matrix + visibility mask reproduce the
    windowed twin in ORIGINAL token order."""
    cfg = get_preset("qavit_v2_c100").model
    g = make_geom(cfg)
    assert g is not None and g.nw == 4 and g.ws2 == 16
    c = g.c
    ks = iter(jax.random.split(jax.random.PRNGKey(5), 16))
    nrm = jax.random.normal
    p = {"qkv": _dense_p(next(ks), c, 3 * c),
         "proj": _dense_p(next(ks), c, c),
         "norm": _ln_p(next(ks), c),
         "linformer": {"E_k": 0.02 * nrm(next(ks), (g.ws2, g.lin_k)),
                       "E_v": 0.02 * nrm(next(ks), (g.ws2, g.lin_k))}}
    xn = nrm(next(ks), (8, g.n, c))
    bank_k = nrm(next(ks), (1, g.bank_s, c))
    bank_v = nrm(next(ks), (1, g.bank_s, c))

    want, want_normed = R.swa_ref(p, xn, bank_k, bank_v, g, jnp.float32)

    # prep only the swa part directly
    swa_prep = {
        "attn": C._prep_attn(p["qkv"]["kernel"], p["qkv"]["bias"],
                             p["proj"], g.heads,
                             colsum=(jnp.tile(p["linformer"]["E_k"].sum(0),
                                              g.nw),
                                     jnp.tile(p["linformer"]["E_v"].sum(0),
                                              g.nw))),
        "big_k": C._kron_big(C._swa_mix(p["linformer"]["E_k"], g), 4),
        "big_v": C._kron_big(C._swa_mix(p["linformer"]["E_v"], g), 4),
        "norm": p["norm"],
    }

    def split(arr):
        return arr[0].reshape(g.bank_s, g.heads, g.d).transpose(1, 0, 2)

    bank = {"k_heads": split(bank_k), "v_heads": split(bank_v)}
    got, got_normed = C.swa_bd(swa_prep, xn, bank, g, 4, jnp.float32,
                               C.NullRng())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_normed),
                               np.asarray(want_normed),
                               rtol=2e-5, atol=2e-5)


def test_multiwindow_full_model_interpret(tiny_plain_cfg, rng):
    """Full model at a MULTI-WINDOW geometry (32px -> 64 patches, 4
    windows of 16) through the REAL Pallas kernels (interpret mode) vs
    the flax path — forward, train forward with bank evolution, and a
    gradient."""
    import qavit_tpu.kernels.fused_block as FB
    from qavit_tpu.kernels.fused_ref import make_geom as mg
    from qavit_tpu.nn import build_model, init_model

    cfg_ref = tiny_plain_cfg.replace(
        name="tiny_mw", img_size=32, dtype="float32", dropout=0.0,
        drop_path=0.0)
    g = mg(cfg_ref)
    assert g is not None and g.nw == 4
    cfg_fused = cfg_ref.replace(attn_impl="fused_block")
    _, variables = init_model(cfg_ref, jax.random.PRNGKey(0))
    x = jax.random.normal(rng, (4, 32, 32, 3))

    def run(force, train):
        model = build_model(cfg_fused)
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            if train:
                out, _ = model.apply(variables, x,
                                     rngs={"dropout": rng},
                                     mutable=["batch_stats"],
                                     train=True, bank_count=0)
                return out
            return model.apply(variables, x, train=False, bank_count=0)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False

    le_ref, _ = run(False, False)
    le_pal, _ = run(True, False)
    np.testing.assert_allclose(np.asarray(le_pal), np.asarray(le_ref),
                               rtol=2e-4, atol=2e-5)
    lt_ref, b_ref = run(False, True)
    lt_pal, b_pal = run(True, True)
    np.testing.assert_allclose(np.asarray(lt_pal), np.asarray(lt_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b_pal.k), np.asarray(b_ref.k),
                               rtol=1e-5, atol=1e-6)

    def loss(params, force):
        model = build_model(cfg_fused)
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            out, _ = model.apply(dict(variables, params=params), x,
                                 rngs={"dropout": rng},
                                 mutable=["batch_stats"],
                                 train=True, bank_count=0)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False
        return jnp.sum(out[0] ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_pal = jax.grad(lambda p: loss(p, True))(variables["params"])
    for got, want in zip(jax.tree_util.tree_leaves(g_pal),
                         jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-4)
    _assert_bank_read_grads(g_pal, g_ref)


def _fused_block_interpret_parity(cfg, g):
    """One whole block at ``cfg``'s fused geometry through the REAL
    Pallas kernels in interpret mode vs the jnp twin — forward, train
    forward with bank evolution, and gradients (VERDICT r2 #2: no
    silently-unvalidated kernel route)."""
    import flax.linen as nn_linen

    import qavit_tpu.kernels.fused_block as FB
    from qavit_tpu.kernels.fused_params import declare_block_params
    from qavit_tpu.nn.bank import BankState, GlobalBankParams

    class Holder(nn_linen.Module):
        @nn_linen.compact
        def __call__(self):
            return declare_block_params(cfg, g)

    holder = Holder()
    p = holder.apply(holder.init({"params": jax.random.PRNGKey(0)}))
    bank_holder = GlobalBankParams(cfg.bank, cfg.embed_dim)
    bank_params = bank_holder.apply(
        bank_holder.init({"params": jax.random.PRNGKey(1)}))
    state = BankState(bank_params["global_k"].astype(jnp.float32),
                      bank_params["global_v"].astype(jnp.float32),
                      jnp.int32(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (4, g.n, g.c))
    rng = jax.random.PRNGKey(3)

    def run(force, train):
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            return FB.fused_quad_block(p, x, state, 0.0, bank_params,
                                       cfg.bank, g, jnp.float32, train,
                                       rng, None)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False

    y_ref, _ = run(False, False)
    y_pal, _ = run(True, False)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)

    yt_ref, s_ref = run(False, True)
    yt_pal, s_pal = run(True, True)
    np.testing.assert_allclose(np.asarray(yt_pal), np.asarray(yt_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pal.k), np.asarray(s_ref.k),
                               rtol=1e-5, atol=1e-6)

    def loss(p, bank_kv, x, force):
        st = BankState(bank_kv[0], bank_kv[1], jnp.int32(0))
        FB.FORCE_PALLAS_INTERPRET = force
        try:
            y, _ = FB.fused_quad_block(p, x, st, 0.0, bank_params,
                                       cfg.bank, g, jnp.float32, True,
                                       rng, None)
        finally:
            FB.FORCE_PALLAS_INTERPRET = False
        return jnp.sum(y.astype(jnp.float32) ** 2)

    bank_kv = (state.k, state.v)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(p, bank_kv, x, False)
    g_pal = jax.grad(loss, argnums=(0, 1, 2))(p, bank_kv, x, True)
    for got, want in zip(jax.tree_util.tree_leaves(g_pal),
                         jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-4)
    # bank READ-gradients (through the carried state) nonzero + matching
    for got, want in zip(g_pal[1], g_ref[1]):
        scale = float(jnp.max(jnp.abs(want)))
        assert scale > 0.0
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale,
                                   rtol=0, atol=5e-3)


@pytest.mark.slow
def test_fused_interpret_224_geometry():
    """224px presets: n=196, window 7 -> nw=4, dilations (1,2,3) ->
    270-site gather pooled to 128 landmarks."""
    cfg = get_preset("qavit_224_v1").model.replace(dropout=0.0)
    g = make_geom(cfg)
    assert g is not None and g.n == 196 and g.nw == 4 and g.ws2 == 49
    assert g.msda_keep == 128  # 270 dilated sites -> 135 pooled, capped
    _fused_block_interpret_parity(cfg, g)


@pytest.mark.slow
def test_fused_interpret_extreme_tin_geometry():
    """qavit_v2_extreme_tin (the BASELINE 'EXTREME on Tiny-ImageNet'
    combination): n=256, window 4 -> nw=16 — the highest window count
    of any preset; validated here before the fused path may route it."""
    cfg = get_preset("qavit_v2_extreme_tin").model.replace(dropout=0.0)
    g = make_geom(cfg)
    assert g is not None and g.n == 256 and g.nw == 16 and g.ws2 == 16
    assert g.msda_keep == 128
    _fused_block_interpret_parity(cfg, g)
