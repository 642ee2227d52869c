"""Driver-contract checks: entry() abstract-compiles single-device;
dryrun_multichip runs a real sharded train step + sharded explanation on the
8-device CPU mesh."""

import jax
import pytest

import __graft_entry__ as ge


def test_entry_traces():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    # [B, T_frames, 32] for 16000 samples -> 49 frames
    assert out.shape == (1, 49, 32)


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU run provides virtual)")
    ge.dryrun_multichip(8)
