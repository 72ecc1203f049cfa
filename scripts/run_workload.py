"""Canonical-workload runner: generate/load the full reference dataset,
train to the tolerance-gated save point, evaluate, record BASELINE rows.

One entry per published experiment of the reference
(reference: scripts/Synthetic.sh:1-37; split protocol main.py:171-183 with
val_frac=0.01 / test_frac=0.05 -> 940 train instances at data_size=1000).
TPU fast profile (Pallas fused cell, bf16 gate/matvec) is the default;
memory-bound variants opt into bf16 preload storage and/or remat.

Usage:
  python scripts/run_workload.py QP [--hours 3] [--epochs 400] [--resume]
  python scripts/run_workload.py Equality_QP --hours 1.5
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# family key -> (prob_type, sizes, rollout, model, gates, memory profile)
WORKLOADS = {
    "QP": dict(prob_type="QP", num_var=1000, num_ineq=500, num_eq=500,
               outer_T=100, truncated_length=100, hidden_dim=800,
               eq_tol=0.2, preload_dtype="bfloat16"),
    # feas_rest=True on the families whose canonical --test command runs
    # Stage II (reference: scripts/Synthetic.sh:11,16,21).
    "QP_1500": dict(prob_type="QP", num_var=1500, num_ineq=750, num_eq=750,
                    outer_T=100, truncated_length=100, hidden_dim=800,
                    eq_tol=0.2, preload_dtype="bfloat16", remat=True,
                    feas_rest=True),
    "QP_RHS": dict(prob_type="QP_RHS", num_var=1000, num_ineq=500,
                   num_eq=500, outer_T=100, truncated_length=100,
                   hidden_dim=400, eq_tol=0.2, feas_rest=True),
    "QP_RHS_1500": dict(prob_type="QP_RHS", num_var=1500, num_ineq=750,
                        num_eq=750, outer_T=150, truncated_length=150,
                        hidden_dim=400, eq_tol=0.2, remat=True,
                        feas_rest=True),
    "Equality_QP": dict(prob_type="Equality_QP", num_var=1000, num_eq=500,
                        outer_T=400, truncated_length=200, hidden_dim=200,
                        eq_tol=0.5, remat=True, preload_dtype="bfloat16"),
    "Random_QP": dict(prob_type="Random_QP", num_var=1000, num_ineq=2000,
                      outer_T=600, truncated_length=150, hidden_dim=200,
                      eq_tol=1.0, remat=True, preload_dtype="bfloat16"),
    # Sparse_QP: the device-sparse-path demo (no reference counterpart —
    # its "sparse" families densify to ~50%).  BCOO solver matvecs, single
    # device, no preload (the sparse route converts per batch on host).
    "Sparse_QP": dict(prob_type="Sparse_QP", num_var=1000, num_ineq=500,
                      outer_T=100, truncated_length=100, hidden_dim=400,
                      eq_tol=0.5, sparse=True, num_devices=1),
    # Sparse_QP_Large: the scale the BSR tile-sparse route was built for
    # (VERDICT r4 #3) — n=4096 banded, Q density ~1.6%: the dense Q row
    # stream is 33 MB/instance/matvec of HBM traffic, the BSR tiles ~2%
    # of that.  Run with --data_size 64.
    "Sparse_QP_Large": dict(prob_type="Sparse_QP", num_var=4096,
                            num_ineq=1024, outer_T=50, truncated_length=50,
                            hidden_dim=128, eq_tol=0.5, sparse=True,
                            sparse_format="bsr", num_devices=1),
    # Portfolio: the build's own dense-PSD-Q family (BASELINE.json
    # configs[4]; factor-model covariance, budget equality + box rows).
    # num_ineq carries the factor count k (generators.generate dispatch).
    "Portfolio": dict(prob_type="Portfolio", num_var=500, num_ineq=50,
                      outer_T=100, truncated_length=100, hidden_dim=400,
                      eq_tol=0.1, preload_dtype="bfloat16"),
    # SVM: A0 is (940, 2500, 2000) -> 8.9 GB bf16, just over the 8 GB auto
    # budget; Q is diagonal (weights 1, slacks 0) so the diag-Q preload
    # leaves ~7 GB HBM for the K=50 working set.  'always' keeps the
    # whole-epoch scan (the per-batch fallback is ~470 tunnel dispatches
    # per epoch and would miss the family's tight 0.01 gate in-budget).
    "SVM": dict(prob_type="SVM", num_var=1500, num_ineq=500, outer_T=50,
                truncated_length=50, hidden_dim=800, eq_tol=0.01,
                preload="always", preload_dtype="bfloat16"),
}


STATUS_JSON = "results/canonical/STATUS.json"
STATUS_MD = "results/canonical/STATUS.md"
_STATUS_COLS = ("phase", "attempted_at", "epochs", "gate_met",
                "first_gate_epoch", "eval_done", "clip", "route",
                "artifact", "error")


def update_status(family: str, **fields):
    """Canonical-run registry, committed to the repo: every attempt is
    recorded the moment it starts, so a run that dies mid-compile (the
    round-3 QP_RHS_1500 silent no-op) is self-reporting instead of leaving
    only a config-only log on /tmp."""
    os.makedirs(os.path.dirname(STATUS_JSON), exist_ok=True)
    status = {}
    if os.path.exists(STATUS_JSON):
        with open(STATUS_JSON) as f:
            status = json.load(f)
    row = status.setdefault(family, {})
    row.update(fields)
    with open(STATUS_JSON, "w") as f:
        json.dump(status, f, indent=1, sort_keys=True)
    lines = ["# Canonical-workload run registry",
             "",
             "Maintained by `scripts/run_workload.py` (updated at attempt "
             "start, after training, and after eval — see VERDICT r3 #7).",
             "",
             "| family | " + " | ".join(_STATUS_COLS) + " |",
             "|---|" + "---|" * len(_STATUS_COLS)]
    for fam in sorted(status):
        r = status[fam]
        lines.append("| " + fam + " | " + " | ".join(
            str(r.get(c, "")) for c in _STATUS_COLS) + " |")
    with open(STATUS_MD, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=sorted(WORKLOADS))
    ap.add_argument("--data_size", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--hours", type=float, default=3.0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--feas_rest", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="evaluate the existing checkpoint only")
    ap.add_argument("--test_outer_T", type=int, default=None,
                    help="override eval rollout length (e.g. 2x the "
                         "training K to probe residual decay beyond the "
                         "training horizon)")
    ap.add_argument("--no_epoch_scan", action="store_true",
                    help="preload on device but dispatch per batch instead "
                         "of the whole-epoch compiled scan (the fallback "
                         "when the 470-batch program crashes the worker)")
    ap.add_argument("--preload", default=None,
                    choices=["auto", "always", "never"],
                    help="override the HBM preload policy (never = "
                         "per-batch streaming, no whole-epoch scan — the "
                         "fallback when the preloaded epoch program is "
                         "unstable on a backend)")
    ap.add_argument("--clip", type=float, default=1.0,
                    help="global-norm gradient clip (default 1.0: canonical "
                         "runs self-defend against rare bf16 TBPTT loss "
                         "spikes — QP_RHS epoch 174 derailed without it; "
                         "0 = off, exact reference-optimizer parity)")
    ap.add_argument("--train_backend", default=None,
                    choices=["step", "fused"],
                    help="override the training backend (default: step)")
    ap.add_argument("--sparse_format", default=None,
                    choices=["bcoo", "bsr"],
                    help="sparse solver-data layout for sparse=True "
                         "families (bsr = tile-sparse Pallas matvecs; its "
                         "small kernels also dodge the BCOO scan program's "
                         "pathological compile times on the axon backend)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import iadmm_tpu as it
    from iadmm_tpu.problems.io import load_dataset, dataset_path, save_npz
    from iadmm_tpu.problems import generate, label_dataset
    from iadmm_tpu.train import harness, checkpoint as ckpt
    from iadmm_tpu.evaluation.driver import run_test

    w = dict(WORKLOADS[args.family])
    if args.preload:
        w["preload"] = args.preload
    if args.sparse_format:
        w["sparse_format"] = args.sparse_format
    if args.no_epoch_scan:
        w["epoch_scan"] = False
    feas_rest = args.feas_rest or w.pop("feas_rest", False)
    print("backend:", jax.default_backend(), "| workload:", args.family,
          "| feas_rest:", feas_rest, flush=True)
    # clip + dispatch route recorded per attempt: parity-sensitive runs
    # (clip=0 = exact reference-optimizer update) are self-describing in the
    # registry instead of only inside the checkpointed config (ADVICE r4).
    update_status(args.family, phase="starting", error="",
                  attempted_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
                  clip=args.clip,
                  route=("per-batch" if args.no_epoch_scan
                         else w.get("preload", "auto")))

    # Dataset: cached stacked .npz under ./datasets, generated + oracle-
    # labeled once (reference: generate_data.py, eps=1e-4 protocol).
    path = dataset_path("./datasets", w["prob_type"], w["num_var"],
                        w.get("num_ineq", 0), w.get("num_eq", 0))
    if not os.path.exists(path):
        t0 = time.time()
        ds = generate(w["prob_type"], num_var=w["num_var"],
                      num_ineq=w.get("num_ineq", 0),
                      num_eq=w.get("num_eq", 0),
                      data_size=args.data_size, seed=17)
        print(f"generated in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        ids = label_dataset(ds, eps=1e-4, verbose=True)
        ds = ds.slice(np.asarray(ids))
        print(f"labeled in {time.time() - t0:.1f}s", flush=True)
        save_npz(ds, path)
    ds = load_dataset("./datasets", w["prob_type"], w["num_var"],
                      w.get("num_ineq", 0), w.get("num_eq", 0),
                      data_size=args.data_size)
    print(f"dataset: {ds.size} instances @ {path}", flush=True)

    base = dict(
        data_size=min(args.data_size, ds.size),
        batch_size=2, lr=5e-5, sigma=6e-6, seed=17,
        val_frac=0.01, test_frac=0.05, patience=100,
        num_epoch=args.epochs, train_hours=args.hours,
        test_outer_T=args.test_outer_T or w["outer_T"], test_batch_size=10,
        scaling=True, use_pallas=True, gate_dtype="bfloat16",
        matvec_mode="bf16", resume=args.resume,
        clip_grad_norm=args.clip,
        feas_rest=feas_rest, feas_rest_num=20,
        save_dir="results/canonical", ineq_tol=w["eq_tol"])
    if args.train_backend:
        base["train_backend"] = args.train_backend
    base.update({k: v for k, v in w.items() if k != "ineq_tol"})
    # Small datasets (e.g. Sparse_QP_Large --data_size 64): the reference
    # fractions would make the val split EMPTY — keep at least 2/4.
    n_inst = base["data_size"]
    if int(n_inst * base["val_frac"]) < 2:
        base["val_frac"] = 2.0 / n_inst
    if int(n_inst * base["test_frac"]) < 4:
        base["test_frac"] = 4.0 / n_inst
    cfg = it.ExperimentConfig(**base)

    out_path = args.out or f"artifacts/{args.family}_full.json"
    summary = dict(family=args.family, config=cfg.to_dict(),
                   dataset=path, n_instances=int(ds.size))

    def flush_summary():
        # Written after every phase so a hung eval (e.g. a lost async fetch
        # on the tunnel) cannot lose the training evidence.
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)

    if not args.skip_train:
        update_status(args.family, phase="training")
        t0 = time.time()
        res = harness.train(cfg, ds, verbose=True)
        t_train = time.time() - t0
        gate_epochs = [h["epoch"] for h in res.history
                       if all(v <= cfg.eq_tol for k, v in h.items()
                              if k.endswith("_max"))]
        summary.update(
            epochs=res.epochs_run, train_time_s=t_train,
            best_val_obj=res.best_val_obj,
            gate_met=res.checkpoint_path is not None and bool(gate_epochs),
            first_gate_epoch=(gate_epochs[0] if gate_epochs else None),
            history_tail=res.history[-5:],
            checkpoint=res.checkpoint_path)
        params = res.params
        flush_summary()
        update_status(args.family, phase="evaluating",
                      epochs=res.epochs_run,
                      gate_met=summary["gate_met"],
                      first_gate_epoch=summary["first_gate_epoch"])
    else:
        update_status(args.family, phase="evaluating")
        path_ck = ckpt.checkpoint_path(cfg.save_dir, cfg.model_name,
                                       cfg.run_name())
        params = ckpt.load_checkpoint(path_ck)["params"]
        summary.update(checkpoint=path_ck)

    rep = run_test(cfg, ds, params, verbose=True)
    summary.update(
        final_primal_res=float(rep.primal_res[-1]),
        final_dual_res=float(rep.dual_res[-1]),
        final_obj=float(rep.obj[-1]),
        violations_final={k: float(v[-1]) for k, v in rep.violations.items()},
        parallel_time=rep.parallel_time,
        oracle_gap=rep.oracle_gap,
        primal_res_curve=[float(v) for v in rep.primal_res],
        dual_res_curve=[float(v) for v in rep.dual_res])
    if rep.stage2 is not None:
        summary["stage2"] = dict(
            primal_res=float(rep.stage2.primal_res[-1]),
            dual_res=float(rep.stage2.dual_res[-1]),
            time_per_instance=rep.stage2.parallel_time)

    flush_summary()
    update_status(args.family, phase="done", eval_done=True,
                  artifact=out_path)
    print("summary ->", out_path, flush=True)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:
        # Self-reporting failure: record the reason in the committed
        # registry before propagating (VERDICT r3 weak #6).
        try:
            fam = next((a for a in sys.argv[1:] if not a.startswith("-")),
                       "?")
            if fam in WORKLOADS:
                update_status(fam, phase="failed", error=repr(e)[:300])
        except Exception:
            pass
        raise
