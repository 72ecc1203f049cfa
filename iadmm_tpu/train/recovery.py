"""Backend-crash recovery helpers for long training runs.

Split out of ``train/harness.py`` (VERDICT r4 weak #6).  The tunnelled TPU
worker can crash outright on the largest programs (UNAVAILABLE on the next
fetch) and restarts itself in ~5-40 minutes (CLAUDE.md round-3/4 facts);
the harness snapshots params/opt_state to host before every risky dispatch
and, on failure, waits the backend out and restores from the snapshot.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def wait_for_backend(timeout_s: float = 3600.0, poll_s: float = 30.0,
                     verbose: bool = True) -> None:
    """Block until the accelerator accepts work again.

    Polls a trivial dispatch+fetch until it succeeds (every dispatch raises
    while the worker is down)."""
    t0 = time.time()
    while True:
        try:
            float(jnp.zeros((), jnp.float32) + 1.0)
            return
        except Exception as e:
            if time.time() - t0 > timeout_s:
                raise RuntimeError(
                    f"backend did not recover within {timeout_s:.0f}s") from e
            if verbose:
                print(f"backend unavailable ({type(e).__name__}); retrying "
                      f"in {poll_s:.0f}s", flush=True)
            time.sleep(poll_s)


def snapshot(params, opt_state):
    """Host copy of the training state (device buffers are donated into the
    next dispatch and unrecoverable after a worker crash)."""
    return (jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, opt_state))


def restore_snapshot(snap, mesh=None):
    """Re-place a host snapshot on device with the run's parameter layout.

    Mesh-aware: under a ``('data', 'model')`` mesh the LSTM gate axes are
    tensor-parallel sharded (dist.tp_shard_params) — restoring replicated
    there would silently change the layout mid-run (ADVICE r4 #2); plain
    data-parallel runs replicate."""
    params = jax.tree.map(jnp.asarray, snap[0])
    opt_state = jax.tree.map(jnp.asarray, snap[1])
    if mesh is not None:
        from .. import dist
        if "model" in mesh.axis_names:
            params = dist.tp_shard_params(params, mesh)
            opt_state = dist.tp_shard_params(opt_state, mesh)
        else:
            params = dist.replicate(params, mesh)
            opt_state = dist.replicate(opt_state, mesh)
    return params, opt_state
