"""Two-process jax.distributed runtime test (SURVEY §2.10).

Spawns 2 fresh processes (each with 2 virtual CPU devices) that join a
localhost coordinator, assemble the ('host', 'env') pod mesh, shard an
env batch host-locally, and run one jitted PPO train step whose gradient
psums cross the process boundary.  This exercises the DCN code path
(jax.distributed + cross-process collectives) that a multi-host TPU pod
uses — the reference framework has no distributed runtime at all
(closest analogue: vec_env subprocess pipes, scripts/vec_env.py:433).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_mesh_train_step():
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # fresh XLA_FLAGS for the workers (2 virtual devices each, not the
    # test session's 8) and no inherited coordinator state
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    oks = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        ok = [ln for ln in out.splitlines() if ln.startswith("DIST_OK")]
        # DIST_OK is the contract: the cross-process psum train step
        # completed and produced a finite replicated result.  The
        # coordination service's atexit SHUTDOWN barrier can still trip
        # afterwards when the two ranks tear down >60 s apart (compile
        # skew on a loaded machine) — returncode only matters when the
        # actual work never finished.
        assert ok, (f"rank {rank} no DIST_OK "
                    f"(rc={p.returncode}):\n{out[-3000:]}")
        oks.append(ok[0])
    # replicated training result must agree across processes
    r0 = oks[0].split("mean_reward=")[1]
    r1 = oks[1].split("mean_reward=")[1]
    assert r0 == r1, (r0, r1)
