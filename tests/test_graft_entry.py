"""Gate tests for __graft_entry__: the driver's single-chip compile check and
the multi-chip dryrun (which must self-force CPU + N virtual devices via a
scrubbed subprocess, regardless of the calling process's backend)."""

import jax
import pytest

import __graft_entry__ as g
from megapose6d_tpu.parallel import make_mesh


def test_make_mesh_raises_on_shortfall():
    n = len(jax.devices())
    with pytest.raises(ValueError, match="requested"):
        make_mesh(n + 1)


@pytest.mark.slow
def test_entry_compiles():
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[1].shape[0]


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    # Exercises the real driver path: subprocess with scrubbed env. Must pass
    # even though this (parent) process already initialized a jax backend.
    g.dryrun_multichip(4)
