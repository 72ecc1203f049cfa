"""Device mesh construction and instance-batch sharding.

The reference is strictly single-device (SURVEY.md §2.4: no
torch.distributed anywhere); QP instances are i.i.d., so **data parallelism
over the instance batch axis is the whole parallelism story** for this
workload.  This module provides:

  * ``make_mesh`` — 1D ``('data',)`` mesh over all (or N) devices; optional
    2D ``('data','model')`` mesh for the tensor-parallel stretch axis;
  * ``shard_batch`` — place a QPBatch/IterState pytree with the leading
    instance axis split over ``'data'`` (XLA then keeps every rollout step
    local and inserts the gradient all-reduce over ICI automatically when
    the loss mean crosses the sharded axis);
  * ``replicate`` — parameters/optimizer state replicated on every device;
  * ``initialize_distributed`` — multi-host bootstrap
    (``jax.distributed.initialize`` over DCN), a no-op on single host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    if model_axis > 1:
        assert n % model_axis == 0, (n, model_axis)
        grid = np.asarray(devs).reshape(n // model_axis, model_axis)
        return Mesh(grid, ("data", "model"))
    return Mesh(np.asarray(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (instance-batch) axis over 'data', everything else local."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf's leading axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


# Tensor-parallel layout for the LSTM cell parameters: the 4h gate axis of
# W/U/b and the h input axis of W_h are split over 'model'; the recurrent
# H@U contraction and the delta = H@W_h reduction then cross the sharded
# axis and XLA inserts the all-gather/psum over ICI (the scaling-book
# recipe: annotate inputs, let GSPMD place collectives).  Schedules
# (rho/alpha) and scalar-ish leaves stay replicated.
_TP_SPECS = {"W": ("last", "model"), "U": ("last", "model"),
             "b": ("last", "model"), "W_h": ("first", "model")}


def _tp_spec(key: str, ndim: int):
    kind = _TP_SPECS.get(key)
    if kind is None:
        return P()
    if kind[0] == "last":
        return P(*([None] * (ndim - 1) + ["model"]))
    return P(*(["model"] + [None] * (ndim - 1)))


def tp_shard_params(tree, mesh: Mesh):
    """Place a params-shaped pytree (the params dict itself, or an optax
    state whose moment leaves mirror it) with the tensor-parallel layout.
    Leaf specs are keyed by the innermost dict key along each path."""
    from jax.tree_util import tree_map_with_path, DictKey

    def place(path, leaf):
        key = None
        for entry in reversed(path):
            if isinstance(entry, DictKey):
                key = str(entry.key)
                break
        spec = _tp_spec(key, getattr(leaf, "ndim", 0)) if key else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return tree_map_with_path(place, tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           timeout_s: int = 300) -> None:
    """Multi-host bootstrap over DCN; no-op when single-process.

    Fails fast with a clear error instead of hanging when the coordinator
    is unreachable (SURVEY.md §5 failure-detection row: the reference has
    nothing; multi-host runs must at least die cleanly)."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s)
    except Exception as e:
        raise RuntimeError(
            f"distributed bootstrap failed (coordinator={coordinator}, "
            f"process {process_id}/{num_processes}): {e}") from e


def sync_hosts(tag: str = "barrier") -> None:
    """Cross-host phase barrier (epoch/checkpoint boundaries); no-op on a
    single process."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
