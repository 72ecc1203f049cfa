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

Memory design for full-dataset training (data_size=1000 at flagship shapes):
only the **scaled** train split lives in HBM — one copy, written chunk-wise
with buffer donation so the peak never holds two copies.  All reported
metrics are recovered from the Ruiz vectors instead of keeping the original
data resident: with x̄ the scaled iterate and (d, e, cost) the factors,

    obj_orig(x) = obj_scaled(x̄) / cost        (x = d·x̄)

since Q̄ = cost·D Q D, p̄ = cost·D p.  Shared-data families (QP_RHS: one
(Q, p, A0) for every instance, reference generate_data.py:31-61) keep the
shared leaves un-stacked, so the full 1000-instance split is a few MB.
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
from ..types import IterState, QPBatch, init_state
from ..solvers.step import get_cell, check_schedule_len
from ..solvers.rollouts import chunk_loss, rollout
from ..evaluation import metrics
from ..utils import profiling
from .early_stopping import EarlyStopping
from . import checkpoint as ckpt
# Preload + recovery machinery live in their own modules (VERDICT r4 weak
# #6: harness.py was regrowing into the monolith it replaced); re-exported
# here for the existing consumers (tests/test_preload.py, scripts).
from .preload import (_SOLVER_FIELDS, _index_batch,  # noqa: F401
                      dataset_q_is_diagonal, train_stack_bytes,
                      device_memory_budget, preload_train_stack,
                      preload_sparse_cache, sparse_cache_bytes)
from .recovery import (wait_for_backend as _wait_for_backend,  # noqa: F401
                       snapshot as _snapshot, restore_snapshot)


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   clip_grad_norm: float = 0.0):
    """Adam with torch-style L2 weight decay (grad += wd * param before the
    moment updates), matching ``optim.Adam(..., weight_decay=...)``
    (reference: main.py:191).

    ``clip_grad_norm > 0`` prepends global-norm gradient clipping.  The
    reference (f32 torch) has no clipping; with bf16 gates a rare bad TBPTT
    chunk can spike the loss ~100x and permanently derail Adam (observed:
    QP_RHS epoch 174, loss 335 -> 45068, artifacts/QP_RHS_full.json), so
    long convergence runs opt in.  Clipping only alters steps whose global
    grad norm exceeds the threshold — steady-state steps are untouched."""
    tx = [optax.clip_by_global_norm(clip_grad_norm)] if clip_grad_norm else []
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.adam(lr))
    return optax.chain(*tx) if len(tx) > 1 else tx[0]


def make_chunk_body(step_fn, optimizer, outer_T: int, chunk_len: int,
                    sigma: float, remat: bool = False, loss_fn=None):
    """The ONE TBPTT chunk update shared by both jitted training routes
    (per-chunk dispatch and the whole-epoch scan): grad of the chunk loss,
    one optimizer step — the reference's per-chunk ``backward(); step()``
    (reference: main.py:349-351).

    ``loss_fn(params, state, data, t0) -> (loss, state')`` overrides the
    scan-of-steps chunk loss (used to swap in the fused training megakernel,
    kernels/train_rollout.py)."""
    if loss_fn is None:
        def loss_fn(p, state, data, t0):
            return chunk_loss(step_fn, p, state, data, sigma,
                              chunk_len, outer_T, t0, remat=remat)

    def chunk_body(params, opt_state, state: IterState, data, t0):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, data, t0)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    return chunk_body


def make_train_chunk(step_fn, optimizer, outer_T: int, chunk_len: int,
                     sigma: float, remat: bool = False, loss_fn=None):
    """Jitted per-chunk TBPTT update (the streaming / per-batch route)."""
    body = make_chunk_body(step_fn, optimizer, outer_T, chunk_len, sigma,
                           remat=remat, loss_fn=loss_fn)
    return partial(jax.jit, donate_argnums=(0, 1, 2))(body)


def make_train_epoch(step_fn, optimizer, outer_T: int, chunk_len: int,
                     sigma: float, batch_size: int, hidden_dim: int,
                     n_batches: int, remat: bool = False, loss_fn=None):
    """Whole-epoch update as ONE compiled scan over batches.

    With the train split preloaded on device, the only remaining per-batch
    cost is dispatch latency (25+ ms/call on a tunnelled backend).  Scanning
    over the batch index (each leaf dynamic-sliced inside the body — the
    same lowering as scan-xs, but it admits shared un-stacked leaves)
    collapses an epoch to a single dispatch; the TBPTT chunks run as an
    inner ``lax.scan`` over the chunk index, so the compiled program holds
    ONE chunk body regardless of outer_T/chunk_len (statically unrolling the
    chunks quadrupled the program at the Random_QP workload — outer_T=600,
    4 remat'd 150-step chunks, m=2000 — and crashed the TPU worker during
    compile).  Optimizer updates stay *per chunk*, matching the reference's
    in-rollout stepping (main.py:336-358)."""
    n_chunks = outer_T // chunk_len
    body = make_chunk_body(step_fn, optimizer, outer_T, chunk_len, sigma,
                           remat=remat, loss_fn=loss_fn)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, stacked: QPBatch):
        def per_batch(carry, bi):
            params, opt_state = carry
            data = jax.tree.map(
                lambda a: _index_batch(a, bi, batch_size), stacked)
            st = init_state(batch_size, data.num_var, data.num_constr,
                            hidden_dim, dtype=jnp.float32)

            def per_chunk(ch_carry, ci):
                params, opt_state, st = ch_carry
                params, opt_state, st, loss = body(
                    params, opt_state, st, data, ci * chunk_len)
                return (params, opt_state, st), loss

            (params, opt_state, st), losses = jax.lax.scan(
                per_chunk, (params, opt_state, st),
                jnp.arange(n_chunks, dtype=jnp.int32))
            return (params, opt_state), (losses[-1], st.x)

        (params, opt_state), (losses, xs) = jax.lax.scan(
            per_batch, (params, opt_state), jnp.arange(n_batches))
        # xs[-1]: final-batch iterate for the reference's last-batch train
        # metrics (main.py:362-379)
        return params, opt_state, losses, xs[-1]

    return train_epoch


def make_val_fn(step_fn, outer_T: int, sigma: float, hidden_dim: int):
    """Jitted full-rollout validation: returns (val_obj, violations dict)
    in ORIGINAL space (reference: main.py:503-534), recovered from the
    scaling vectors — the objective is the scaled objective / cost, the
    violations use the (never-scaled) metric views against d·x̄."""

    @jax.jit
    def val_fn(params, data_scaled, scaling):
        B = data_scaled.p.shape[0]
        st = init_state(B, data_scaled.num_var, data_scaled.num_constr,
                        hidden_dim, dtype=data_scaled.p.dtype)
        st = rollout(step_fn, params, st, data_scaled, sigma, outer_T)
        obj = metrics.obj_fn(st.x, data_scaled.Q, data_scaled.p)
        if scaling is not None:
            obj = obj / scaling.cost
            x = scaling.d * st.x
        else:
            x = st.x
        vios = metrics.violation_stats(x, data_scaled)
        return obj.mean(), vios

    return val_fn


# Test hook (tests/test_harness_recovery.py): inject one epoch-scan failure
# to exercise the crash-fallback path on CPU, where a real TPU-worker crash
# cannot be produced.  {"crash_first_epoch_scan": True} arms it.
_TEST_HOOKS: Dict[str, bool] = {}


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
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay,
                               cfg.clip_grad_norm)
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

    # Device mesh (SURVEY.md §2.4): instance batch over 'data' (XLA inserts
    # the gradient all-reduce over ICI when the loss mean crosses the
    # sharded axis) and, with model_devices>1, the LSTM hidden/gate axes
    # over 'model' (dist.tp_shard_params layout).
    from .. import dist
    ndev = min(cfg.num_devices or len(jax.devices()), len(jax.devices()))
    mp = max(1, cfg.model_devices)
    if mp > 1:
        if cfg.train_backend == "fused":
            raise ValueError("model_devices>1: the fused training megakernel "
                             "is data-parallel only (shard_map over 'data')")
        if cfg.sparse:
            raise ValueError("model_devices>1 is not supported with sparse")
        if cfg.use_pallas:
            raise ValueError("model_devices>1 requires the XLA cell "
                             "(use_pallas=False): the per-step Pallas kernel "
                             "is not partitionable over 'model'")
        if ndev < mp or cfg.hidden_dim % mp:
            raise ValueError(f"model_devices={mp} needs {mp}+ devices and "
                             f"hidden_dim divisible by it")
        dp = ndev // mp
        while dp > 1 and cfg.batch_size % dp:
            dp -= 1
        ndev = dp * mp
        mesh = dist.make_mesh(ndev, model_axis=mp)
        if verbose:
            print(f"mesh: data={dp} x model={mp}")
    else:
        while ndev > 1 and cfg.batch_size % ndev:
            ndev -= 1
        mesh = dist.make_mesh(ndev) if ndev > 1 else None
        if verbose and mesh is not None:
            print(f"data-parallel over {ndev} devices")

    # Sparse problem-data route: BCOO / BSR solver matvecs (kernels/sparse).
    # Data-parallel composes via shard_map over the instance axis
    # (make_sparse_chunk_loss); validation metrics stay dense.
    sparse_mod = None
    if cfg.sparse:
        from ..kernels import sparse as sparse_mod  # noqa: F811

    # Fused training megakernel: the whole TBPTT segment (fwd + hand-derived
    # bwd) runs VMEM-resident in two Pallas kernels (kernels/train_rollout).
    fused_loss = None
    if cfg.sparse and cfg.train_backend == "fused":
        raise ValueError("train_backend='fused' is a dense-data kernel; "
                         "use the step path with sparse=True")
    if cfg.train_backend == "fused":
        if cfg.model_name != "lstm":
            raise ValueError("train_backend='fused' supports the lstm cell")
        from ..kernels.train_rollout import make_fused_chunk_loss
        fused_loss = make_fused_chunk_loss(
            num_var=ds.Q.shape[-1], num_constr=ds.A0.shape[-2],
            batch=cfg.batch_size // (ndev if mesh is not None else 1),
            hidden=cfg.hidden_dim,
            sigma=cfg.sigma, chunk_len=cfg.truncated_length,
            outer_T=cfg.outer_T, K_total=cfg.outer_T,
            compute_dtype="bfloat16" if cfg.matvec_mode == "bf16"
            else "float32",
            interpret=jax.default_backend() != "tpu", mesh=mesh)

    loss_override = fused_loss
    if sparse_mod is not None:
        loss_override = sparse_mod.make_sparse_chunk_loss(
            cfg.sigma, cfg.truncated_length, cfg.outer_T,
            remat=cfg.remat, mesh=mesh)

    train_chunk = make_train_chunk(step_fn, optimizer, cfg.outer_T,
                                   cfg.truncated_length, cfg.sigma,
                                   remat=cfg.remat, loss_fn=loss_override)
    val_fn = make_val_fn(step_fn, cfg.outer_T, cfg.sigma, cfg.hidden_dim)
    scale_jit = jax.jit(partial(scale_batch, iters=cfg.scaling_ites))

    # Val set: load once, scale once; only the scaled copy (plus the
    # never-scaled metric views it shares with the original) is kept.
    val_scaled = to_qp_batch(ds, val_ids)
    val_sc = None
    if cfg.scaling:
        val_scaled, val_sc = scale_jit(val_scaled)

    ckpt_path = ckpt.checkpoint_path(cfg.save_dir, cfg.model_name,
                                     cfg.run_name())
    best: Dict = {}

    # Epoch-level resume (the reference only ever saves, never resumes
    # training, SURVEY.md §5 checkpoint row).  The gated best checkpoint is
    # the reference-parity artifact; a ``..._latest`` sibling is written at
    # loop exit so a budget-bound run that never met the gate (or whose
    # best is many epochs old) can still be topped up — resume prefers
    # whichever is newer.
    latest_path = ckpt_path + "_latest"
    start_epoch = 0
    resumed_best = None
    if cfg.resume:
        payload = None
        best_epoch = -1
        if os.path.exists(ckpt_path):
            payload = ckpt.load_checkpoint(ckpt_path)
            best_epoch = int(payload.get("epoch", 0))
            resumed_best = payload.get("best")
        if os.path.exists(latest_path):
            latest = ckpt.load_checkpoint(latest_path)
            if int(latest.get("epoch", 0)) > best_epoch:
                payload = dict(latest)
                # keep the GATED best's stopper state so a later in-gate
                # epoch can't overwrite a strictly better checkpoint
                if resumed_best is not None:
                    payload["best"] = resumed_best
        if payload is not None:
            params = jax.tree.map(jnp.asarray, payload["params"])
            if "opt_state" in payload:
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    [jnp.asarray(l) for l in
                     jax.tree_util.tree_leaves(payload["opt_state"])])
            start_epoch = int(payload.get("epoch", 0)) + 1
            resumed_best = payload.get("best")
            if verbose:
                print(f"resumed at epoch {start_epoch} "
                      f"(gated best epoch: {best_epoch})")
    check_schedule_len(params, cfg.outer_T)

    def save_best():
        # Host copy: the live `params` buffers are donated into the next
        # train_chunk call and would be deleted under this reference.
        best["params"] = jax.tree.map(np.asarray, params)
        ckpt.save_checkpoint(ckpt_path, {
            "params": best["params"], "opt_state": opt_state,
            "epoch": best.get("epoch", 0),
            "best": {"val_obj": stopper.best_loss,
                     "counter": stopper.counter},
            "config": cfg.to_dict()})

    stopper = EarlyStopping(patience=cfg.patience, save_fn=save_best)
    if resumed_best:
        # Restore the gate state so the first in-tolerance epoch after a
        # resume can't overwrite a strictly better pre-resume checkpoint
        # (ADVICE round 1).
        stopper.best_loss = resumed_best.get("val_obj")
        stopper.counter = int(resumed_best.get("counter", 0))
    n_batches = len(train_ids) // cfg.batch_size
    n_chunks = cfg.outer_T // cfg.truncated_length
    history = []
    epochs_run = 0

    if mesh is not None:
        params, opt_state = restore_snapshot((params, opt_state), mesh)

    # Preload + pre-scale the whole train split on device ONCE (scaled-only,
    # chunk-written — see module docstring).  The reference re-reads,
    # re-transfers, and re-scales every batch every epoch (main.py:198-310);
    # scaling is deterministic per instance so all of that is loop-invariant.
    # "auto" preloads when one copy fits the HBM budget.
    n_used = n_batches * cfg.batch_size
    stacked = cost_stack = None
    dtype_bytes = 2 if cfg.preload_dtype == "bfloat16" else 4
    # Diagonal-Hessian families (QP / QP_RHS) preload Q as (…, n) vectors —
    # the in-kernel paths (fused training backend) need the dense matrix, so
    # they keep dense storage.
    diag_q = (not cfg.sparse and cfg.preload != "never"
              and cfg.train_backend != "fused"
              and dataset_q_is_diagonal(ds))
    train_bytes = train_stack_bytes(ds, n_used, dtype_bytes, diag_q=diag_q)
    if not cfg.sparse and (
            cfg.preload == "always" or (cfg.preload == "auto" and
                                        train_bytes < device_memory_budget())):
        stacked, cost_stack = preload_train_stack(
            ds, train_ids[:n_used], n_batches, cfg.batch_size, cfg,
            scale_jit, mesh=mesh, diag_q=diag_q)
        if verbose:
            print(f"preloaded train split: {train_bytes / 1e9:.2f} GB "
                  f"scaled-only on device"
                  + (" (diagonal-Q storage)" if diag_q else ""))

    # Sparse route: scale + convert the whole train split ONCE and keep the
    # converted batches device-resident (preload.py — round 4 reconverted
    # per batch per epoch, which dominated the Sparse_QP epoch time).
    # ``preload='never'`` opts back into per-batch conversion.
    sparse_cache = None
    if cfg.sparse and cfg.preload != "never":
        sparse_cache = preload_sparse_cache(
            ds, train_ids[:n_used], n_batches, cfg.batch_size, cfg,
            scale_jit, mesh=mesh, verbose=verbose)

    # Whole-epoch compiled scan (one dispatch per epoch) when preloaded.
    # Only worth the larger compile when there are enough batches for the
    # per-batch dispatch latency to matter.
    epoch_fn = None
    if stacked is not None and n_batches >= 8 and cfg.epoch_scan:
        epoch_fn = make_train_epoch(step_fn, optimizer, cfg.outer_T,
                                    cfg.truncated_length, cfg.sigma,
                                    cfg.batch_size, cfg.hidden_dim,
                                    n_batches, remat=cfg.remat,
                                    loss_fn=fused_loss)

    index_stack = None
    if stacked is not None:
        # Defined whenever the stack exists (jit is lazy, so this costs
        # nothing unless dispatched): it is also the fallback route when the
        # whole-epoch scan crashes the worker mid-run.
        @jax.jit
        def index_stack(stacked, cost_stack, bi):
            data = jax.tree.map(
                lambda a: _index_batch(a, bi, cfg.batch_size), stacked)
            cost = (_index_batch(cost_stack, bi, cfg.batch_size)
                    if cost_stack is not None else None)
            return data, cost

    @jax.jit
    def last_batch_obj(x_last, stacked, cost_stack):
        Q = _index_batch(stacked.Q, n_batches - 1, cfg.batch_size)
        p = _index_batch(stacked.p, n_batches - 1, cfg.batch_size)
        obj = metrics.obj_fn(x_last, Q, p)
        if cost_stack is not None:
            obj = obj / _index_batch(cost_stack, n_batches - 1,
                                     cfg.batch_size)
        return obj.mean()

    t_begin = time.time()
    epoch = start_epoch
    first_dispatch = True
    recoveries = 0
    while epoch < cfg.num_epoch:
        if cfg.train_hours and (time.time() - t_begin) > cfg.train_hours * 3600:
            if verbose:
                print(f"wall-clock budget ({cfg.train_hours}h) reached at "
                      f"epoch {epoch}")
            break
        t_start = time.time()
        cancel_watchdog = profiling.start_compile_watchdog(
            "train epoch" if epoch_fn is not None else "train chunk",
            hint="Fallback knobs: use_pallas=false (XLA step), "
                 "train_backend='step', or wait out the contention.") \
            if first_dispatch else (lambda: None)
        first_dispatch = False
        if epoch_fn is not None:
            # Host snapshot before the dispatch: params/opt_state are donated
            # into the epoch program, so if the TPU worker crashes mid-epoch
            # (a recorded failure mode of 470-batch programs — CLAUDE.md)
            # the live buffers are unrecoverable without it.
            snap = _snapshot(params, opt_state)
            try:
                if _TEST_HOOKS.pop("crash_first_epoch_scan", False):
                    raise RuntimeError("injected epoch-scan crash (test)")
                params, opt_state, losses, x_last = epoch_fn(
                    params, opt_state, stacked)
                loss = float(losses[-1])  # completion barrier: crash surfaces
                train_obj_dev = last_batch_obj(x_last, stacked, cost_stack)
            except Exception as e:
                cancel_watchdog()
                if recoveries >= 3:
                    raise
                recoveries += 1
                msg = repr(e)
                runlog.log("epoch_scan_crash", epoch=epoch, error=msg[:500])
                print(f"whole-epoch scan failed at epoch {epoch}: "
                      f"{msg[:200]}\n-> downgrading to per-batch dispatch "
                      f"over the preloaded stack and retrying this epoch",
                      flush=True)
                epoch_fn = None
                first_dispatch = True
                _wait_for_backend(verbose=verbose)
                params, opt_state = restore_snapshot(snap, mesh)
                # The preloaded stack died with the worker: rebuild it.
                stacked, cost_stack = preload_train_stack(
                    ds, train_ids[:n_used], n_batches, cfg.batch_size, cfg,
                    scale_jit, mesh=mesh, diag_q=diag_q)
                continue  # retry the SAME epoch on the per-batch route
        else:
            # Same crash insurance for the per-batch route: a worker crash
            # mid-epoch (or any transient dispatch failure) retries this
            # epoch from a host snapshot instead of killing an hours-long
            # run.  Bounded (with the scan-downgrade above) at 3 recoveries
            # per training run so a real bug still raises.
            snap = _snapshot(params, opt_state)
            try:
                if _TEST_HOOKS.pop("crash_per_batch", False):
                    raise RuntimeError("injected per-batch crash (test)")
                last = None
                for bi in range(n_batches):
                    if sparse_cache is not None:
                        chunk_data, cost = sparse_cache[bi]
                        st = init_state(cfg.batch_size, chunk_data.num_var,
                                        chunk_data.num_constr, cfg.hidden_dim)
                        if mesh is not None:
                            st = dist.shard_batch(st, mesh)
                        for ci in range(n_chunks):
                            t0 = jnp.asarray(ci * cfg.truncated_length,
                                             jnp.int32)
                            params, opt_state, st, loss = train_chunk(
                                params, opt_state, st, chunk_data, t0)
                        last = (chunk_data, st, cost, loss)
                        if bi % 16 == 15:
                            float(loss)
                        continue
                    if stacked is not None:
                        # epoch_scan=False route: one jitted gather from the
                        # device-resident scaled stack per batch — no host
                        # staging (the 129 GB leak) and no 470-batch program
                        # (the TPU-worker crash), at ~one dispatch per batch.
                        data, cost = index_stack(stacked, cost_stack,
                                                 jnp.asarray(bi, jnp.int32))
                    else:
                        ids = train_ids[bi * cfg.batch_size:
                                        (bi + 1) * cfg.batch_size]
                        data_orig = to_qp_batch(ds, ids)
                        if mesh is not None:
                            data_orig = dist.shard_batch(data_orig, mesh)
                        if cfg.scaling:
                            data, sc = scale_jit(data_orig)
                            cost = sc.cost
                        else:
                            data, cost = data_orig, None
                    st = init_state(cfg.batch_size, data.num_var,
                                    data.num_constr, cfg.hidden_dim)
                    if mesh is not None:
                        st = dist.shard_batch(st, mesh)
                    chunk_data = (sparse_mod.from_dense(
                        data, fmt=cfg.sparse_format,
                        dtype=(jnp.bfloat16 if cfg.matvec_mode == "bf16"
                               else jnp.float32),
                        interpret=jax.default_backend() not in ("tpu",))
                        if sparse_mod is not None else data)
                    for ci in range(n_chunks):
                        t0 = jnp.asarray(ci * cfg.truncated_length, jnp.int32)
                        params, opt_state, st, loss = train_chunk(
                            params, opt_state, st, chunk_data, t0)
                    last = (data, st, cost, loss)
                    # Periodic completion barrier: the tunnelled backend is
                    # fully async, so every streamed batch's host staging
                    # buffers stay pinned until a device->host fetch.  Without
                    # this, a 470-batch epoch over a 12 GB dataset grew the
                    # process to 129 GB and got OOM-killed (Random_QP,
                    # --preload never).  ~25 ms per fetch, every 16 batches.
                    if bi % 16 == 15:
                        float(loss)
                data, st, cost, loss = last
                if sparse_cache is not None:
                    train_obj_dev = sparse_mod.obj_fn_sparse(st.x, data)
                else:
                    train_obj_dev = metrics.obj_fn(st.x, data.Q, data.p)
                if cost is not None:
                    train_obj_dev = train_obj_dev / cost
                train_obj_dev = train_obj_dev.mean()
                loss = float(loss)  # completion barrier inside the guard
            except Exception as e:
                cancel_watchdog()
                if recoveries >= 3:
                    raise
                recoveries += 1
                msg = repr(e)
                runlog.log("per_batch_crash", epoch=epoch, error=msg[:500])
                print(f"per-batch epoch {epoch} failed: {msg[:200]}\n"
                      f"-> waiting for backend recovery and retrying this "
                      f"epoch", flush=True)
                first_dispatch = True
                _wait_for_backend(verbose=verbose)
                params, opt_state = restore_snapshot(snap, mesh)
                if stacked is not None:
                    stacked, cost_stack = preload_train_stack(
                        ds, train_ids[:n_used], n_batches, cfg.batch_size,
                        cfg, scale_jit, mesh=mesh, diag_q=diag_q)
                if sparse_cache is not None:
                    # The converted cache died with the worker: rebuild it.
                    sparse_cache = preload_sparse_cache(
                        ds, train_ids[:n_used], n_batches, cfg.batch_size,
                        cfg, scale_jit, mesh=mesh, verbose=verbose)
                continue
        loss = float(loss)  # host fetch = epoch completion barrier
        cancel_watchdog()
        t_train = time.time() - t_start

        # Train metrics on the last batch, unscaled via the cost vector
        # (reference: main.py:362-379).
        train_obj = float(train_obj_dev)

        # Validation.
        t_v = time.time()
        val_obj, vios = val_fn(params, val_scaled, val_sc)
        val_obj = float(val_obj)
        t_val = time.time() - t_v
        vio_maxes = [float(v) for k, v in vios.items() if k.endswith("_max")]

        # bf16 TBPTT loss-spike guard (on by default): a rare bad chunk can
        # spike the loss ~100x and permanently derail Adam (observed: QP_RHS
        # epoch 174, loss 335 -> 45068, artifacts/QP_RHS_full.json — the f32
        # torch reference cannot hit this).  When the epoch loss exceeds
        # ``spike_rollback_factor`` x the recent median and a gated
        # checkpoint exists, restore its params + optimizer state and keep
        # training instead of riding the divergence.
        spiked = False
        if (cfg.spike_rollback_factor and history
                and best.get("params") is not None):
            ref_loss = float(np.median([h["train_loss"]
                                        for h in history[-5:]]))
            if np.isfinite(ref_loss) and (
                    not np.isfinite(loss)
                    or loss > cfg.spike_rollback_factor * abs(ref_loss)):
                spiked = True
                runlog.log("spike_rollback", epoch=epoch, loss=loss,
                           ref_loss=ref_loss)
                print(f"Epoch {epoch}: loss spike {ref_loss:.2f} -> "
                      f"{loss:.2f}; rolling back to the gated checkpoint",
                      flush=True)
                payload = ckpt.load_checkpoint(ckpt_path)
                opt_restored = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    jax.tree_util.tree_leaves(payload["opt_state"]))
                params, opt_state = restore_snapshot(
                    (payload["params"], opt_restored), mesh)

        best["epoch"] = epoch
        early = False
        if not spiked:
            early = stopper.step(val_obj, cfg.early_stop_mode, cfg.eq_tol,
                                 vio_maxes)
        rec = dict(epoch=epoch, train_obj=train_obj, val_obj=val_obj,
                   train_loss=float(loss), train_time=t_train,
                   val_time=t_val,
                   **({"rollback": True} if spiked else {}),
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
        epoch += 1

        def save_latest():
            # The ``_latest`` sibling lets a top-up resume continue even when
            # the tolerance gate was never met (the gated best checkpoint is
            # untouched).
            try:
                ckpt.save_checkpoint(latest_path, {
                    "params": jax.tree.map(np.asarray, params),
                    "opt_state": opt_state,
                    "epoch": epochs_run - 1,
                    "best": ({"val_obj": stopper.best_loss,
                              "counter": stopper.counter}
                             if stopper.best_loss is not None else None),
                    "config": cfg.to_dict()})
            except Exception as e:  # never let bookkeeping kill the run
                print(f"latest-checkpoint save failed: {e!r}", flush=True)

        # Periodic, not just at loop exit: a run killed from outside (shell
        # timeout, OOM-kill, reset) used to lose EVERY epoch since its last
        # gated save — the round-4 QP_1500 top-up hit its queue timeout one
        # step before the exit save and dropped 12 epochs.
        if epochs_run > start_epoch and (epoch - start_epoch) % 10 == 0:
            save_latest()
        if early:
            break

    # Latest-state checkpoint at loop exit (budget / patience / completion).
    if epochs_run > start_epoch:
        save_latest()

    # Return device arrays: best["params"] is a host copy (donation safety),
    # but consumers index rho/alpha with traced t inside scans.
    final_params = jax.tree.map(jnp.asarray, best.get("params", params))
    return TrainResult(params=final_params, history=history,
                       best_val_obj=stopper.best_loss,
                       epochs_run=epochs_run,
                       checkpoint_path=ckpt_path if best.get("params")
                       is not None else None)
