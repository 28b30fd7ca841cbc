"""Test configuration: force CPU with 8 virtual devices so mesh/shard_map
tests run without TPU hardware (SURVEY.md §4)."""

import os

# NOTE: this environment exports JAX_PLATFORMS=axon (remote TPU) and the
# plugin ignores env-var overrides — the config update below is the only
# reliable way to force the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the tiny-model compiles dominate test time
# on this 1-core host; warm runs are ~10x faster
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from qavit_tpu.configs import ModelConfig, TrainingConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> ModelConfig:
    """Smallest structurally-complete hybrid config (fast on 1 CPU core)."""
    return ModelConfig(
        name="tiny_test",
        img_size=16, patch_size=4, num_classes=10,
        embed_dim=48, depth=2, num_heads=4,
        window_size=4, dilation_factors=(1, 2), linformer_k=8,
        msda_pad_len=32,
        hybrid=True, stem_kind="v1", cnn_c2=8, cnn_c3=12, cnn_c4=16,
        rrcv_channels=8, use_token_learner=True, num_learned_tokens=16,
        stage_blocks=(1, 1, 0, 0),
        dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_plain_cfg(tiny_cfg) -> ModelConfig:
    return tiny_cfg.replace(name="tiny_plain", hybrid=False,
                            use_token_learner=False, stage_blocks=(2,))


@pytest.fixture(scope="session")
def tiny_train_cfg() -> TrainingConfig:
    return TrainingConfig(batch_size=4, epochs=2, warmup_epochs=1,
                          use_ema=True, donate=False)


@pytest.fixture(scope="session")
def tiny_bundle(tiny_cfg):
    """Shared (model, variables) for the tiny hybrid config."""
    from qavit_tpu.nn import init_model

    return init_model(tiny_cfg, jax.random.PRNGKey(0))


@pytest.fixture(scope="session")
def tiny_plain_bundle(tiny_plain_cfg):
    from qavit_tpu.nn import init_model

    return init_model(tiny_plain_cfg, jax.random.PRNGKey(0))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
