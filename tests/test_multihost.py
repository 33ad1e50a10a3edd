"""Multi-host (multi-process) tier of the scale-out design, run hermetically.

Spawns TWO real jax.distributed processes on CPU (4 virtual devices each,
Gloo for cross-process collectives) — the faithful stand-in for a 2-host TPU
pod: tp collectives stay inside a process (ICI analog), the train step's
gradient psum crosses processes (DCN analog). The reference has no
multi-anything (SURVEY.md §2); this covers `parallel/multihost.py`.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # Clean CPU-only workers: the axon TPU plugin must not dial its relay
    # (CLAUDE.md environment facts), and each process gets 4 virtual devices.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def test_global_mesh_explicit_dp():
    """An explicit dp with tp unset derives tp = n // dp instead of letting
    the tp heuristic break the factorisation."""
    import jax

    from dlimgedit_tpu.parallel.multihost import global_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = global_mesh(dp=8, devices=devs[:8])
    assert dict(mesh.shape) == {"dp": 8, "tp": 1}
    mesh = global_mesh(dp=2, devices=devs[:8])
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}


def test_local_rows_rejects_trailing_axis_sharding():
    """local_rows dedups by leading index; a trailing-axis (tp) sharding
    would make that silently wrong, so it must raise instead."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlimgedit_tpu.parallel.mesh import make_mesh
    from dlimgedit_tpu.parallel.multihost import local_rows

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = make_mesh(8, dp=4, tp=2, devices=devs[:8])
    x = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    ok = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    np.testing.assert_array_equal(local_rows(ok), x)
    bad = jax.device_put(x, NamedSharding(mesh, P("dp", "tp")))
    with pytest.raises(ValueError, match="leading-axis"):
        local_rows(bad)


def test_two_process_mesh_encode_and_train(tmp_path):
    port = _free_port()
    env = _worker_env()
    ckpt_dir = str(tmp_path / "mh_ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(pid),
             ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        assert "MULTIHOST-OK" in out, out[-4000:]
    # Both ranks must observe the identical globally-reduced loss.
    losses = {out.split("loss=")[1].split()[0] for out in outs
              if "loss=" in out}
    assert len(losses) == 1, outs
