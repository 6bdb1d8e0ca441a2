"""Driver contract: entry() compiles and runs; dryrun_multichip covered by
the driver itself (and exercised manually on the 8-device CPU mesh)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 768)
    import numpy as np

    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
