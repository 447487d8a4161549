"""Multi-host (multi-process) glue: 2 CPU processes, 4 virtual devices each,
join one 8-device mesh, assemble a global batch from per-process local data,
and run a data-parallel jitted reduction whose collectives cross the process
boundary (the DCN path of SURVEY.md §5; reference's only analogue is
mp.Queue host IPC, extract_features_mp.py:204)."""
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from islx.parallel import mesh as M

pid = int(sys.argv[1])
active = M.init_distributed(coordinator_address={coord!r},
                            num_processes=2, process_id=pid)
assert active, "init_distributed returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np

mesh = M.make_mesh()           # (data=8, model=1) over both processes
# per-process local batch: process p holds rows valued p+1
local = np.full((4, 6), float(pid + 1), np.float32)
gx = M.global_batch_from_local(mesh, local)
assert gx.shape == (8, 6), gx.shape

@jax.jit
def global_mean(x):
    return x.mean()

m = float(global_mean(gx))     # all-reduce across both processes
assert abs(m - 1.5) < 1e-6, m

# per-shard identity check: sum == 4*6*1 + 4*6*2 = 72
s = float(jax.jit(lambda x: x.sum())(gx))
assert abs(s - 72.0) < 1e-4, s
print(f"worker {{pid}} ok mean={{m}}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_and_global_batch():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=repo, coord=coord)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out, out
