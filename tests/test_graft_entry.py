"""Driver-contract checks: entry() abstract-compiles single-device;
dryrun_multichip runs a real sharded train step + sharded explanation on the
8-device CPU mesh."""

import jax

import __graft_entry__ as ge


def test_entry_traces():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    # [B, T_frames, 32] for 16000 samples -> 49 frames
    assert out.shape == (1, 49, 32)


def test_dryrun_multichip():
    # Never skips: on the 8-virtual-CPU test mesh this runs in-process; on a
    # scarce-device host dryrun_multichip self-provisions via subprocess.
    ge.dryrun_multichip(8)


def test_dryrun_subprocess_fallback():
    """The scarce-device path: a fresh interpreter forcing a virtual CPU mesh
    (what the driver's 1-TPU bench host exercises). Small n keeps it fast."""
    ge._dryrun_subprocess(2)
