"""Driver contract: entry() compiles and runs; dryrun_multichip provisions
its own virtual CPU mesh and runs a full sharded train step."""

import os
import subprocess
import sys
from pathlib import Path

import jax

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 768)
    import numpy as np

    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_dryrun_default_plan_is_debug_only(monkeypatch):
    """Driver-budget contract (VERDICT r4 ask 1): with a clean environment,
    the dryrun plan must contain ONLY debug-shape presets — the base-shape
    sweep is a 35-50 min 1-core compile and is strictly opt-in."""
    import __graft_entry__ as g

    for var in ("DRYRUN_MODEL", "EMM_DRYRUN_PRESETS",
                "EMM_DRYRUN_BASE_PRESETS"):
        monkeypatch.delenv(var, raising=False)
    plan = g._dryrun_plan()
    assert plan, "default plan must not be empty"
    assert all(model == "vlmo_debug" for model, _ in plan), plan
    assert {p for _, p in plan} == {"fsdp", "zero1", "tp", "fsdp_offload"}

    # and the opt-in path still schedules the base sweep after the debug one
    monkeypatch.setenv("DRYRUN_MODEL", "vlmo_base")
    plan = g._dryrun_plan()
    assert plan[-1] == ("vlmo_base", "zero1")
    assert all(m == "vlmo_debug" for m, _ in plan[:-1])


def test_dryrun_multichip_inprocess(monkeypatch):
    """Conftest already provisions 8 fake CPU devices, so this runs the
    real sharded step in-process (the fast path of dryrun_multichip).
    DRYRUN_MODEL=none keeps the test on the debug-shape sweep — the
    base-shape sweep is a multi-10-minute compile validated by the driver
    artifact (MULTICHIP_r{N}) rather than per-suite-run."""
    import __graft_entry__ as g

    monkeypatch.setenv("DRYRUN_MODEL", "none")
    g.dryrun_multichip(8)


def test_dryrun_multichip_driver_style():
    """Call it the way the driver does: a fresh python with no virtual-mesh
    env, so dryrun_multichip must self-provision the CPU mesh in a
    subprocess (MULTICHIP_r01.json failure mode)."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_EMM_DRYRUN_CHILD")
    }
    # keep the test hermetic + fast: stay off any real accelerator and give
    # the child exactly ONE visible device so the self-provision path fires;
    # debug-shape sweep only (see test_dryrun_multichip_inprocess)
    env["JAX_PLATFORMS"] = "cpu"
    env["DRYRUN_MODEL"] = "none"
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g\n"
         "g.dryrun_multichip(8)\n"],
        cwd=str(REPO_ROOT),
        env=env,
        capture_output=True,
        text=True,
        # 4 preset train-step compiles on an 8-device virtual mesh: ~8-16
        # min cold on a 1-core VM (cached compiles pass in ~2 min)
        timeout=1800,
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "dryrun_multichip OK" in res.stdout + res.stderr
