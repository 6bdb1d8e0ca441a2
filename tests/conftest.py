"""Test harness: force an 8-device CPU platform before JAX initializes.

Multi-device sharding tests (SURVEY.md §4: gather-with-grad VJP, sharded
optimizer step, metric psum) run on JAX's fake multi-device CPU backend —
`--xla_force_host_platform_device_count=8` — the JAX-native equivalent of a
fake process group. The TPU plugin in this image force-registers itself from
sitecustomize, so platform selection must be overridden via jax.config before
any backend initialization.
"""

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/emm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 fake CPU devices, got {devices}"
    return devices
