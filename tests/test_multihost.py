"""Multi-host (multi-process) readiness: 2 CPU processes, DCN-style mesh.

TPU-native equivalent of the reference's DDP/NCCL scaling (SURVEY §5.8):
jax.distributed.initialize + one global Mesh(('data','model')) spanning both
processes' devices.  Exercises the env-gated mode of dryrun_multichip.
"""

import os
import subprocess
import sys


def test_two_process_dryrun(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = dict(os.environ)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["TNGP_COORDINATOR"] = "127.0.0.1:18742"
    env_base["TNGP_NUM_PROCESSES"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["TNGP_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "__graft_entry__.py"), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
        assert "dryrun_multichip OK" in out and "processes=2" in out, out[-500:]
    # both processes computed the same global loss
    l0 = [l for l in outs[0].splitlines() if "dryrun_multichip OK" in l][0]
    l1 = [l for l in outs[1].splitlines() if "dryrun_multichip OK" in l][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
