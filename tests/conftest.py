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


# ---- quick tier -----------------------------------------------------------
# `pytest -m quick`: the fast unit files (measured round 4, BENCH.md suite
# table) — <5 min on one idle core vs ~35 min for the full suite. Heavier
# files (e2e trainer, dryrun, backbone/jit-compile-bound suites) stay in the
# default run only.
QUICK_FILES = {
    "test_config.py",
    "test_arrow_datasets.py",
    "test_multiprocess_staging.py",
    "test_optim.py",
    "test_data.py",
    "test_ops.py",
    "test_native_loader.py",
    "test_torch_parity.py",
    "test_parallel.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if os.path.basename(str(item.fspath)) in QUICK_FILES:
            item.add_marker(_pytest.mark.quick)
