"""The driver entry points (__graft_entry__) must work in any environment:
`entry()` compiles single-chip; `dryrun_multichip(n)` must self-provision a
virtual CPU mesh when fewer than n real devices are visible (the round-1
driver gate failed exactly there, MULTICHIP_r01.json)."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices -> in-process path.
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


def test_dryrun_multichip_small_mesh():
    graft.dryrun_multichip(4)


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (130, 130)
