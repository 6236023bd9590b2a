"""Test configuration: run JAX on CPU with 8 virtual devices so the
sharding tests exercise real multi-device programs without TPU hardware
(SURVEY §4: shard-count invariance is the analogue of the reference's
thread-count invariance)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env selects a TPU backend
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest

import jax

# The environment's sitecustomize (axon TPU tunnel) overrides
# jax_platforms to "axon,cpu" at interpreter start — running tests on
# the single shared TPU serialises everything and breaks the 8-device
# mesh tests.  Force CPU explicitly at config level.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is dominated by XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from spydrpick_tpu.core.alignment import Alignment


def random_alignment(
    n_samples=64, n_loci=40, seed=0, gap_frac=0.1, n_original=None
) -> Alignment:
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(n_samples, n_loci)).astype(np.uint8)
    gaps = rng.random((n_samples, n_loci)) < gap_frac
    codes[gaps] = 4
    return Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(n_samples)],
        id_string="test",
        translation=np.arange(n_loci, dtype=np.int64),
        n_original_positions=n_original or n_loci,
        weights=rng.random(n_samples) * 0.9 + 0.1,
    )


@pytest.fixture
def small_alignment():
    return random_alignment()
