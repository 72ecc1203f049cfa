"""Training harness: TBPTT over unrolled ADMM iterations.

Faithful TPU re-design of the reference's training driver
(reference: main.py:187-547):

  * one **jitted chunk step** runs ``truncated_length`` learned iterations
    under ``lax.scan``, takes the gradient of the accumulated
    primal+dual-residual loss, and applies one Adam update — exactly the
    reference's per-chunk ``backward(); step()`` TBPTT
    (reference: main.py:336-351);
  * iterate state crossing the jit boundary between chunks is implicitly
    detached — the reference's explicit ``.detach()`` dance
    (reference: main.py:353-358);
  * parameters updated between chunks feed the next chunk of the SAME
    rollout, matching the reference's in-rollout optimizer stepping;
  * validation is a single jitted full-K rollout over the whole val set with
    unscaled objective/violation metrics (reference: main.py:382-534), with
    the val set loaded ONCE (the reference re-reads it from disk every
    epoch, reference: main.py:384-465 — fixed).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ExperimentConfig
from ..problems.generators import RawDataset
from ..problems.io import to_qp_batch, split_ids
from ..scaling import scale_batch
from ..types import IterState, init_state
from ..solvers.step import get_cell
from ..solvers.rollouts import chunk_loss, rollout
from ..evaluation import metrics
from .early_stopping import EarlyStopping
from . import checkpoint as ckpt


def make_optimizer(lr: float, weight_decay: float = 0.0):
    """Adam with torch-style L2 weight decay (grad += wd * param before the
    moment updates), matching ``optim.Adam(..., weight_decay=...)``
    (reference: main.py:191)."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    return optax.adam(lr)


def make_train_chunk(step_fn, optimizer, outer_T: int, chunk_len: int,
                     sigma: float, remat: bool = False):
    """Build the jitted TBPTT chunk update."""

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_chunk(params, opt_state, state: IterState, data, t0):
        def loss_fn(p):
            return chunk_loss(step_fn, p, state, data, sigma,
                              chunk_len, outer_T, t0, remat=remat)

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    return train_chunk


def make_train_epoch(step_fn, optimizer, outer_T: int, chunk_len: int,
                     sigma: float, batch_size: int, hidden_dim: int,
                     remat: bool = False):
    """Whole-epoch update as ONE compiled scan over batches.

    With the train split preloaded on device, the only remaining per-batch
    cost is dispatch latency (25+ ms/call on a tunnelled backend).  Scanning
    over the stacked (n_batches, B, ...) data pytree collapses an epoch to a
    single dispatch; the TBPTT chunks are statically unrolled inside the
    scan body (n_chunks is small).  Optimizer updates stay *per chunk*,
    matching the reference's in-rollout stepping (main.py:336-358)."""
    n_chunks = outer_T // chunk_len

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, data_stack):
        def per_batch(carry, data):
            params, opt_state = carry
            st = init_state(batch_size, data.num_var, data.num_constr,
                            hidden_dim, dtype=data.p.dtype)
            loss = jnp.zeros((), data.p.dtype)
            for ci in range(n_chunks):
                t0 = jnp.asarray(ci * chunk_len, jnp.int32)

                def loss_fn(p, st=st, t0=t0, data=data):
                    return chunk_loss(step_fn, p, st, data, sigma,
                                      chunk_len, outer_T, t0, remat=remat)

                (loss, st), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, st.x)

        (params, opt_state), (losses, xs) = jax.lax.scan(
            per_batch, (params, opt_state), data_stack)
        # xs[-1]: final-batch iterate for the reference's last-batch train
        # metrics (main.py:362-379)
        return params, opt_state, losses, xs[-1]

    return train_epoch


def make_val_fn(step_fn, outer_T: int, sigma: float, hidden_dim: int):
    """Jitted full-rollout validation: returns (val_obj, violations dict)
    computed in original space (reference: main.py:503-534)."""

    @jax.jit
    def val_fn(params, data_scaled, data_orig, d_scaling):
        B = data_scaled.p.shape[0]
        st = init_state(B, data_scaled.num_var, data_scaled.num_constr,
                        hidden_dim, dtype=data_scaled.p.dtype)
        st = rollout(step_fn, params, st, data_scaled, sigma, outer_T)
        x = st.x if d_scaling is None else d_scaling * st.x
        obj = metrics.obj_fn(x, data_orig.Q, data_orig.p).mean()
        vios = metrics.violation_stats(x, data_orig)
        return obj, vios

    return val_fn


@dataclasses.dataclass
class TrainResult:
    params: Dict
    history: list
    best_val_obj: Optional[float]
    epochs_run: int
    checkpoint_path: Optional[str]


def train(cfg: ExperimentConfig, ds: RawDataset,
          verbose: bool = True) -> TrainResult:
    """End-to-end training per the reference protocol (main.py:187-547)."""
    from ..utils.logging import RunLog
    runlog = RunLog(os.path.join(cfg.save_dir, cfg.model_name,
                                 cfg.run_name() + ".log.jsonl")
                    if cfg.save_dir else None)
    runlog.log("config", **cfg.to_dict())
    train_ids, val_ids, _ = split_ids(cfg.data_size, cfg.val_frac,
                                      cfg.test_frac, cfg.seed)
    cell = get_cell(cfg.model_name)
    key = jax.random.PRNGKey(cfg.seed)
    params = cell.init(key, cfg.input_dim, cfg.hidden_dim, cfg.outer_T,
                       **({"inner_T": cfg.inner_T}
                          if cfg.model_name == "multi_layer_lstm" else {}))
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)

    # Step backend: Pallas fused cell / matvec precision profile apply to
    # the LSTM model only (other cells use their registry step).
    step_fn = cell.step
    if cfg.model_name == "lstm" and (cfg.use_pallas
                                     or cfg.matvec_mode != "highest"):
        from ..solvers.step import make_lstm_step
        step_fn = make_lstm_step(
            use_pallas=cfg.use_pallas, gate_dtype=cfg.gate_dtype,
            matvec_mode=None if cfg.matvec_mode == "highest"
            else cfg.matvec_mode)

    # Data-parallel mesh over the instance batch (SURVEY.md §2.4): XLA
    # inserts the gradient all-reduce over ICI when the loss mean crosses
    # the sharded axis.
    from .. import dist
    ndev = min(cfg.num_devices or len(jax.devices()), len(jax.devices()))
    while ndev > 1 and cfg.batch_size % ndev:
        ndev -= 1
    mesh = dist.make_mesh(ndev) if ndev > 1 else None
    if verbose and mesh is not None:
        print(f"data-parallel over {ndev} devices")

    train_chunk = make_train_chunk(step_fn, optimizer, cfg.outer_T,
                                   cfg.truncated_length, cfg.sigma,
                                   remat=cfg.remat)
    val_fn = make_val_fn(step_fn, cfg.outer_T, cfg.sigma, cfg.hidden_dim)
    scale_jit = jax.jit(partial(scale_batch, iters=cfg.scaling_ites))

    # Val set: load once, scale once.
    val_orig = to_qp_batch(ds, val_ids)
    if cfg.scaling:
        val_scaled, val_sc = scale_jit(val_orig)
        val_d = val_sc.d
    else:
        val_scaled, val_d = val_orig, None

    ckpt_path = ckpt.checkpoint_path(cfg.save_dir, cfg.model_name,
                                     cfg.run_name())
    best: Dict = {}

    # Epoch-level resume (the reference only ever saves, never resumes
    # training, SURVEY.md §5 checkpoint row).
    start_epoch = 0
    if cfg.resume and os.path.exists(ckpt_path):
        payload = ckpt.load_checkpoint(ckpt_path)
        params = jax.tree.map(jnp.asarray, payload["params"])
        if "opt_state" in payload:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state),
                [jnp.asarray(l) for l in
                 jax.tree_util.tree_leaves(payload["opt_state"])])
        start_epoch = int(payload.get("epoch", 0)) + 1
        if verbose:
            print(f"resumed from {ckpt_path} at epoch {start_epoch}")

    def save_best():
        # Host copy: the live `params` buffers are donated into the next
        # train_chunk call and would be deleted under this reference.
        best["params"] = jax.tree.map(np.asarray, params)
        ckpt.save_checkpoint(ckpt_path, {
            "params": best["params"], "opt_state": opt_state,
            "epoch": best.get("epoch", 0), "config": cfg.to_dict()})

    stopper = EarlyStopping(patience=cfg.patience, save_fn=save_best)
    n_batches = len(train_ids) // cfg.batch_size
    n_chunks = cfg.outer_T // cfg.truncated_length
    history = []
    epochs_run = 0

    if mesh is not None:
        params = dist.replicate(params, mesh)
        opt_state = dist.replicate(opt_state, mesh)

    # Preload + pre-scale the whole train split on device ONCE.  The
    # reference re-reads, re-transfers, and re-scales every batch every
    # epoch (main.py:198-310); scaling is deterministic per instance so all
    # of that is loop-invariant.  "auto" preloads when it fits in HBM.
    preloaded = None
    n_used = n_batches * cfg.batch_size
    train_bytes = 4 * n_used * (ds.Q.shape[-1] ** 2
                                + 2 * ds.A0.shape[-2] * ds.A0.shape[-1])
    if mesh is None and (cfg.preload == "always" or
                         (cfg.preload == "auto" and train_bytes < 4e9)):
        orig_all = to_qp_batch(ds, train_ids[:n_used])
        if cfg.scaling:
            scaled_all, sc_all = scale_jit(orig_all)
            d_all = sc_all.d
        else:
            scaled_all, d_all = orig_all, None
        preloaded = {"orig": orig_all, "scaled": scaled_all, "d": d_all}

    # Whole-epoch compiled scan (one dispatch per epoch) when preloaded.
    # Only worth the larger compile when there are enough batches for the
    # per-batch dispatch latency to matter.
    epoch_fn = data_stack = None
    if preloaded is not None and n_batches >= 8:
        stripped = dataclasses.replace(preloaded["scaled"], G=None, c=None,
                                       A=None, b=None, lb=None, ub=None)
        data_stack = jax.tree.map(
            lambda a: a.reshape((n_batches, cfg.batch_size) + a.shape[1:]),
            stripped)
        epoch_fn = make_train_epoch(step_fn, optimizer, cfg.outer_T,
                                    cfg.truncated_length, cfg.sigma,
                                    cfg.batch_size, cfg.hidden_dim,
                                    remat=cfg.remat)

    for epoch in range(start_epoch, cfg.num_epoch):
        t_start = time.time()
        if epoch_fn is not None:
            params, opt_state, losses, x_last = epoch_fn(params, opt_state,
                                                         data_stack)
            loss = losses[-1]
            sl = slice((n_batches - 1) * cfg.batch_size,
                       n_batches * cfg.batch_size)
            data_orig = jax.tree.map(lambda a: a[sl], preloaded["orig"])
            d_vec = (preloaded["d"][sl]
                     if preloaded["d"] is not None else None)
            x = x_last if d_vec is None else d_vec * x_last
        else:
            last_batch = None
            for bi in range(n_batches):
                ids = train_ids[bi * cfg.batch_size:
                                (bi + 1) * cfg.batch_size]
                data_orig = to_qp_batch(ds, ids)
                if mesh is not None:
                    data_orig = dist.shard_batch(data_orig, mesh)
                if cfg.scaling:
                    data, sc = scale_jit(data_orig)
                    d_vec = sc.d
                else:
                    data, d_vec = data_orig, None
                st = init_state(cfg.batch_size, data.num_var,
                                data.num_constr, cfg.hidden_dim)
                if mesh is not None:
                    st = dist.shard_batch(st, mesh)
                for ci in range(n_chunks):
                    t0 = jnp.asarray(ci * cfg.truncated_length, jnp.int32)
                    params, opt_state, st, loss = train_chunk(
                        params, opt_state, st, data, t0)
                last_batch = (data_orig, st, d_vec, loss)
            data_orig, st, d_vec, loss = last_batch
            x = st.x if d_vec is None else d_vec * st.x
        loss = float(loss)  # host fetch = epoch completion barrier
        t_train = time.time() - t_start

        # Train metrics on the last batch, unscaled (reference: main.py:362-379).
        train_obj = float(metrics.obj_fn(x, data_orig.Q, data_orig.p).mean())

        # Validation.
        t_v = time.time()
        val_obj, vios = val_fn(params, val_scaled, val_orig, val_d)
        val_obj = float(val_obj)
        t_val = time.time() - t_v
        vio_maxes = [float(v) for k, v in vios.items() if k.endswith("_max")]

        best["epoch"] = epoch
        early = stopper.step(val_obj, cfg.early_stop_mode, cfg.eq_tol,
                             vio_maxes)
        rec = dict(epoch=epoch, train_obj=train_obj, val_obj=val_obj,
                   train_loss=float(loss), train_time=t_train,
                   val_time=t_val,
                   **{k: float(v) for k, v in vios.items()})
        history.append(rec)
        runlog.log("epoch", **rec)
        if verbose and epoch % cfg.log_every == 0:
            vio_str = " | ".join(f"{k}: {float(v):.4f}"
                                 for k, v in vios.items())
            print(f"Epoch {epoch} | Train_Obj {train_obj:.3f} | "
                  f"Val_Obj {val_obj:.3f} | Loss {float(loss):.4f} | "
                  f"Train_Time {t_train:.2f}s | Val_Time {t_val:.2f}s | "
                  f"{vio_str}")
        epochs_run = epoch + 1
        if early:
            break

    # Return device arrays: best["params"] is a host copy (donation safety),
    # but consumers index rho/alpha with traced t inside scans.
    final_params = jax.tree.map(jnp.asarray, best.get("params", params))
    return TrainResult(params=final_params, history=history,
                       best_val_obj=stopper.best_loss,
                       epochs_run=epochs_run,
                       checkpoint_path=ckpt_path if best.get("params")
                       is not None else None)
