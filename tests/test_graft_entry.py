"""Guards for the driver entry points: entry() must stay jittable and
dryrun_multichip must execute on the virtual mesh."""

import sys
import pathlib

import jax

import pytest

# multi-minute e2e tier: deselected by default, run via `make test`
pytestmark = pytest.mark.slow

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_solves():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.projected_control)
    assert bool(out.solved)


def test_dryrun_multichip_virtual_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, jax.device_count()))
