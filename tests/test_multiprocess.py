"""Multi-process (multi-host) bootstrap executed for real.

Spawns two OS processes that bootstrap through
``dist.initialize_distributed`` (jax.distributed over a localhost
coordinator, the same code path a TPU pod uses over DCN), build a global
('data',) mesh spanning both processes, run one data-parallel least-squares
train step whose gradient psum crosses the process boundary, and pass a
``sync_hosts`` barrier.  This covers the real branch of
``dist/mesh.py::initialize_distributed`` that single-process tests can't
reach (SURVEY.md §2.4 collectives row).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env(**extra):
    """Worker env with a clean CPU backend: the image's sitecustomize
    registers the axon TPU backend at interpreter start whenever
    PALLAS_AXON_POOL_IPS is set, which would claim the (single) chip and
    pin the platform before the worker code runs — scrub it."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")}
    env.update(IADMM_REPO=REPO, JAX_PLATFORMS="cpu", **extra)
    return env

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["IADMM_REPO"])

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from iadmm_tpu.dist import mesh as M

pid = int(os.environ["IADMM_PROC"])
M.initialize_distributed(coordinator=os.environ["IADMM_COORD"],
                         num_processes=2, process_id=pid, timeout_s=60)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()       # 2 local x 2 processes

mesh = M.make_mesh()                                 # global ('data',) mesh
data_sh = NamedSharding(mesh, P("data"))
repl_sh = NamedSharding(mesh, P())

# Global batch of 8 (4 per process): least-squares y = w*x, one Adam-less
# SGD step.  grad wrt the replicated w reduces over the sharded batch axis
# -> XLA inserts the cross-process psum.
local_x = (np.arange(4, dtype=np.float32) + 4.0 * pid)
local_y = 3.0 * local_x
gx = jax.make_array_from_process_local_data(data_sh, local_x, (8,))
gy = jax.make_array_from_process_local_data(data_sh, local_y, (8,))
w = jax.device_put(jnp.float32(0.0), repl_sh)

@jax.jit
def step(w, x, y):
    loss, g = jax.value_and_grad(
        lambda w: jnp.mean((w * x - y) ** 2))(w)
    return loss, w - 0.01 * g

loss, w1 = step(w, gx, gy)
# analytic: loss = mean(9 x^2) over x=0..7, grad = mean(-2 x * 3x)
xs = np.arange(8.0)
assert abs(float(loss) - float(np.mean(9 * xs**2))) < 1e-3, float(loss)
assert abs(float(w1) - 0.01 * float(np.mean(6 * xs**2))) < 1e-3, float(w1)

M.sync_hosts("test-barrier")
print(f"proc {pid} OK loss={float(loss):.3f}", flush=True)
"""


def test_two_process_bootstrap_and_dp_step():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    procs = []
    for pid in range(2):
        env = _cpu_env(IADMM_PROC=str(pid), IADMM_COORD=coord)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process bootstrap hung (180s)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out


def test_initialize_distributed_fails_fast():
    """Unreachable coordinator dies quickly with a clear error, not a hang
    (dist/mesh.py failure-detection contract).  This JAX's distributed
    client LOG(FATAL)s on a coordination deadline (terminating the process)
    rather than raising, so assert on exit code + message, not on the
    RuntimeError wrapper."""
    code = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.environ["IADMM_REPO"])
from iadmm_tpu.dist import mesh as M
M.initialize_distributed(coordinator="127.0.0.1:1",
                         num_processes=2, process_id=1, timeout_s=5)
print("UNREACHABLE-CONNECTED")
"""
    out = subprocess.run([sys.executable, "-c", code], env=_cpu_env(),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0, out.stdout
    assert "UNREACHABLE-CONNECTED" not in out.stdout
    blob = out.stdout + out.stderr
    assert ("DEADLINE_EXCEEDED" in blob or "bootstrap failed" in blob
            or "Deadline" in blob), blob
