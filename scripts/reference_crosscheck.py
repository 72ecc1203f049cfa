"""End-to-end accuracy cross-check against the actual torch reference.

Protocol (VERDICT round-1, item 7):
 1. generate + oracle-label a small QP dataset with THIS framework and
    export it to the reference's per-instance gz-pickle layout;
 2. train the reference (read-only, /root/reference, torch CPU) on it to
    its tolerance-gated checkpoint (reference: main.py:187-547);
 3. run the reference's --test --save_sol branch to export its
    per-iteration residual traces (.mat, reference: main.py:1164-1268);
 4. import the reference-trained .pth into this framework
    (cells.from_reference_naming) and evaluate the SAME test split with our
    driver;
 5. diff the residual/objective-vs-iteration curves and write
    artifacts/reference_crosscheck.json.

The reference is driven as an oracle via runpy with a shim for its latent
``weight_decay``-undeclared defect (SURVEY.md §5 config row) — its source
is never modified or copied.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Shape/protocol knobs are env-overridable so the same script covers both
# the fast n=100 check and a canonical-ish n=300/K=100/h=400 run
# (REFCHECK_N=300 REFCHECK_MI=150 ... REFCHECK_WORK=/tmp/refcheck300).
_e = os.environ.get
WORK = _e("REFCHECK_WORK", "/tmp/refcheck")
REF = "/root/reference"
PROB = _e("REFCHECK_PROB", "QP")   # QP | Equality_QP | Random_QP
N = int(_e("REFCHECK_N", 100))
MI = int(_e("REFCHECK_MI", 50))
ME = int(_e("REFCHECK_ME", 50))
K = int(_e("REFCHECK_K", 50))
H = int(_e("REFCHECK_H", 128))
DSIZE = int(_e("REFCHECK_DSIZE", 100))
# The canonical lr=5e-5 is tuned for the n=1000/h=800 flagship and barely
# moves at this tiny shape (val eq_max stuck ~0.92 after 100 epochs), so the
# reference's tolerance gate never lets it save.  The cross-check compares
# per-iteration eval curves on IDENTICAL weights, not training quality, so
# use a workable lr and a gate the tiny model can pass.
EPOCHS = int(_e("REFCHECK_EPOCHS", 120))
LR = _e("REFCHECK_LR", "5e-4")
TOL = _e("REFCHECK_TOL", "1.0")

# Family naming (reference main.py:78-115, 200-216): run tag for the
# dataset dir / .pth / _results.mat, and the per-instance gz prefix.
if PROB == "QP":
    TAG, GZ_PREFIX = f"QP_{N}_{MI}_{ME}", "qp"
elif PROB == "Equality_QP":
    MI = 0
    TAG, GZ_PREFIX = f"Equality_QP_{N}_{ME}", "equality_qp"
elif PROB == "Random_QP":
    ME = 0
    TAG, GZ_PREFIX = f"Random_QP_{N}_{MI}", "random_qp"
else:
    raise SystemExit(f"unsupported REFCHECK_PROB={PROB}")

RUNNER = textwrap.dedent("""
    import sys, runpy
    sys.path.insert(0, "%(ref)s")
    sys.argv = ["main.py"] + sys.argv[1:]
    runpy.run_path("%(ref)s/main.py", run_name="__main__")
""" % dict(ref=REF))

# Minimal configargparse stand-in (not in this image): CLI > YAML > defaults
# precedence, plus the reference's relied-upon behavior of materializing
# yaml-only keys (its undeclared ``weight_decay``, SURVEY.md §5).
CONFIGARGPARSE_SHIM = textwrap.dedent("""
    import argparse, sys
    import yaml


    class ArgumentParser(argparse.ArgumentParser):
        def __init__(self, *a, **kw):
            kw.pop("default_config_files", None)
            super().__init__(*a, **kw)
            self._cfg_dest = None

        def add_argument(self, *a, **kw):
            is_cfg = kw.pop("is_config_file", False)
            action = super().add_argument(*a, **kw)
            if is_cfg:
                self._cfg_dest = action.dest
            return action

        def parse_known_args(self, args=None, namespace=None):
            ns, rest = super().parse_known_args(args, namespace)
            argv = sys.argv[1:] if args is None else args
            cli = {t[2:].split("=")[0].replace("-", "_")
                   for t in argv if t.startswith("--")}
            path = getattr(ns, self._cfg_dest, None) if self._cfg_dest \\
                else None
            if path:
                with open(path) as f:
                    data = yaml.safe_load(f) or {}
                for k, v in data.items():
                    if k not in cli:
                        setattr(ns, k, v)
            return ns, rest


    ArgParser = ArgumentParser
""")


def ref_cmd(extra):
    base = [sys.executable, os.path.join(WORK, "run_ref.py"),
            "--config", f"{REF}/configs/QP.yaml",
            "--prob_type", PROB, "--num_var", str(N),
            "--num_ineq", str(MI), "--num_eq", str(ME),
            "--data_size", str(DSIZE), "--hidden_dim", str(H),
            "--outer_T", str(K), "--truncated_length", str(K),
            "--test_outer_T", str(K), "--test_batch_size", "5",
            "--batch_size", "2", "--lr", LR, "--sigma", "6e-6",
            "--eq_tol", TOL, "--ineq_tol", TOL,
            "--num_epoch", str(EPOCHS), "--device", "cpu",
            "--model_name", "LSTM", "--scaling", "--seed", "17"]
    return base + extra


def main():
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from iadmm_tpu.problems import generate, label_dataset
    from iadmm_tpu.problems.io import (save_reference_gz_dir, load_dataset,
                                       split_ids)

    os.makedirs(WORK, exist_ok=True)
    with open(os.path.join(WORK, "run_ref.py"), "w") as f:
        f.write(RUNNER)
    with open(os.path.join(WORK, "configargparse.py"), "w") as f:
        f.write(CONFIGARGPARSE_SHIM)

    gz_dir = os.path.join(WORK, "datasets", TAG)
    if not os.path.isdir(gz_dir) or len(os.listdir(gz_dir)) < DSIZE:
        ds = generate(PROB, num_var=N, num_ineq=MI, num_eq=ME,
                      data_size=DSIZE, seed=17)
        ids = label_dataset(ds, eps=1e-4)
        assert len(ids) == DSIZE, "oracle failed on some instances"
        save_reference_gz_dir(ds, gz_dir, GZ_PREFIX)
        print(f"exported {DSIZE} instances -> {gz_dir}", flush=True)

    pth = os.path.join(WORK, "results", "lstm", "params",
                       f"{TAG}_{K}_{H}.pth")
    if not os.path.exists(pth):
        t0 = time.time()
        r = subprocess.run(ref_cmd([]), cwd=WORK, capture_output=True,
                           text=True)
        open(os.path.join(WORK, "ref_train.log"), "w").write(
            r.stdout + r.stderr)
        print(f"reference training: {time.time() - t0:.0f}s "
              f"rc={r.returncode} (log {WORK}/ref_train.log)", flush=True)
        if not os.path.exists(pth):
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            raise SystemExit("reference never reached its save gate")

    mat_path = os.path.join(WORK, "results", "lstm",
                            f"{TAG}_{K}_{H}_results.mat")
    if not os.path.exists(mat_path):
        r = subprocess.run(ref_cmd(["--test", "--save_sol"]), cwd=WORK,
                           capture_output=True, text=True)
        open(os.path.join(WORK, "ref_test.log"), "w").write(
            r.stdout + r.stderr)
        print(f"reference test rc={r.returncode}", flush=True)

    # ---- our framework: same data (via the reference-format loader), the
    # reference-trained parameters, the same split ----
    import torch
    import iadmm_tpu as it
    from iadmm_tpu.solvers.cells import from_reference_naming
    from iadmm_tpu.evaluation.driver import run_test

    sd = torch.load(pth, map_location="cpu")
    params = from_reference_naming(
        {k: v.detach().numpy() for k, v in sd.items()})
    ds = load_dataset(os.path.join(WORK, "datasets"), PROB, N, MI, ME,
                      data_size=DSIZE)
    cfg = it.ExperimentConfig(
        prob_type=PROB, num_var=N, num_ineq=MI, num_eq=ME,
        data_size=DSIZE, hidden_dim=H, outer_T=K, truncated_length=K,
        test_outer_T=K, test_batch_size=5, batch_size=2,
        val_frac=0.01, test_frac=0.05, seed=17, scaling=True,
        sigma=6e-6, save_dir="")
    rep = run_test(cfg, ds, params, verbose=False)

    out = dict(config=dict(n=N, mi=MI, me=ME, K=K, hidden=H,
                           data_size=DSIZE),
               ours=dict(primal_res=[float(v) for v in rep.primal_res],
                         dual_res=[float(v) for v in rep.dual_res],
                         obj=[float(v) for v in rep.obj]))

    if os.path.exists(mat_path):
        import scipy.io
        mat = scipy.io.loadmat(mat_path)
        ref_curves = {}
        for k in ("primal_res", "dual_res", "objs", "ls_res"):
            if k in mat:
                ref_curves[k] = np.asarray(mat[k]).ravel()
        # reference stacks per-batch traces; average to per-iteration if 2-D
        ref = {k: (v.reshape(-1, K).mean(0) if v.size % K == 0 and
                   v.size != K else v)
               for k, v in ref_curves.items()}
        out["reference"] = {k: [float(x) for x in v] for k, v in ref.items()}
        for ok, rk in (("primal_res", "primal_res"), ("dual_res", "dual_res"),
                       ("obj", "objs")):
            if rk in ref and len(ref[rk]) == K:
                a = np.asarray(out["ours"][ok])
                b = np.asarray(ref[rk], np.float64)
                rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-6)
                out[f"rel_diff_{ok}"] = dict(max=float(rel.max()),
                                             mean=float(rel.mean()),
                                             final_ours=float(a[-1]),
                                             final_ref=float(b[-1]))
                print(f"{ok}: ours {a[-1]:.4f} vs ref {b[-1]:.4f} "
                      f"(max rel diff over t: {rel.max():.4f})", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    art = _e("REFCHECK_OUT", "artifacts/reference_crosscheck.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print("->", art, flush=True)


if __name__ == "__main__":
    main()
