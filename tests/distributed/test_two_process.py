"""REAL multi-process execution (VERDICT r3 missing #4): two OS
processes joined by ``jax.distributed`` on localhost CPU train a DSGD
ring epoch on a global 2-device mesh and save the row-sharded
checkpoint; the result must be bitwise-identical to the same ring on
2 virtual devices in one process. This is the evidence that the DCN
story (SURVEY §5.8) survives a process boundary — collectives, global
arrays from host data, and the no-gather Orbax save all included."""

import os
import socket
import subprocess
import sys

import numpy as np
TOOL = os.path.join(os.path.dirname(__file__), "..", "..", "tools",
                    "two_process_bringup.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, env_extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, TOOL] + args,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_ring_matches_single_process(tmp_path):
    port = _free_port()
    dist_dir = tmp_path / "dist_ckpt"
    ref_dir = tmp_path / "ref_ckpt"
    kids = [
        _run(
            ["--role", "child", "--process-id", str(i),
             "--port", str(port), "--out", str(dist_dir)],
            {},
        )
        for i in range(2)
    ]
    outs = []
    for p in kids:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(kids, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out}"
        assert "up; global devices" in out
        assert "saved" in out
    # both processes computed the identical replicated fingerprint
    fps = [
        line for out in outs for line in out.splitlines()
        if line.startswith("fingerprint")
    ]
    assert len(fps) == 2 and fps[0] == fps[1], fps

    ref = _run(
        ["--role", "single2", "--out", str(ref_dir)],
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )
    out, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, out
    assert fps[0] in out, (fps, out)  # same fingerprint across topologies

    # restore BOTH checkpoints here (different topology again: the
    # parent's 8 virtual devices) and compare bitwise
    from jax.sharding import SingleDeviceSharding

    import jax

    from mfx.train.checkpoint import load_checkpoint

    dev0 = SingleDeviceSharding(jax.devices()[0])
    unsharded = lambda key, shape, dtype: dev0
    m_dist, ep_d, _ = load_checkpoint(dist_dir, shardings=unsharded)
    m_ref, ep_r, _ = load_checkpoint(ref_dir, shardings=unsharded)
    assert ep_d == ep_r == 2
    for f in ("P", "Q", "bu", "bi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(m_dist, f)), np.asarray(getattr(m_ref, f)),
            err_msg=f"2-process ring diverges from single-process on {f}",
        )
