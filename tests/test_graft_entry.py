"""Driver contract: entry() lowers single-chip; dryrun_multichip runs."""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_entry_lowers():
    fn, args = graft.entry()
    jax.jit(fn).lower(*args)  # compile-check without executing
