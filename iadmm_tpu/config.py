"""Strict dataclass configuration.

Replaces the reference's configargparse setup (reference: main.py:22-65),
fixing its latent defects (SURVEY.md §5): unknown keys are hard errors
instead of silently dropped (`parse_known_args`, reference: main.py:65), and
every knob is declared (the reference used ``args.weight_decay`` without
declaring it, reference: main.py:191).
"""

from __future__ import annotations

import dataclasses

try:
    import yaml
    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


@dataclasses.dataclass
class ExperimentConfig:
    """Every live knob of the reference (SURVEY.md §5 knob list), plus
    TPU-specific additions at the bottom."""

    # --- optimizee / problem (reference: main.py:26-31) ---
    prob_type: str = "QP"
    num_var: int = 100
    num_eq: int = 0
    num_ineq: int = 0
    qplib_num: int = 0              # QPLIB instance id (prob_type='QPLIB')
    data_size: int = 1000
    data_root: str = "./datasets"

    # --- model (reference: main.py:33-38) ---
    model_name: str = "lstm"        # cell registry key
    input_dim: int = 2
    hidden_dim: int = 800
    sigma: float = 6e-6
    inner_T: int = 50               # multi_layer_lstm only (QP.yaml:28)
    scaling: bool = True
    scaling_ites: int = 10

    # --- training (reference: main.py:41-62) ---
    outer_T: int = 100
    truncated_length: int = 100
    batch_size: int = 2
    lr: float = 5e-5
    weight_decay: float = 0.0
    clip_grad_norm: float = 0.0     # >0 = optax global-norm clip (TPU-native
                                    # safety knob; reference has none — see
                                    # harness.make_optimizer)
    spike_rollback_factor: float = 25.0  # restore the gated checkpoint when
                                    # the epoch loss exceeds this x the
                                    # recent median (bf16 TBPTT spike guard,
                                    # harness.train; 0 = off)
    num_epoch: int = 1000
    eq_tol: float = 0.2
    ineq_tol: float = 0.2
    early_stop_mode: str = "min"
    patience: int = 100
    val_frac: float = 0.01
    test_frac: float = 0.05
    seed: int = 17
    save_dir: str = "./results/"

    # --- test / inference ---
    test_outer_T: int = 100
    test_batch_size: int = 1
    feas_rest: bool = False
    feas_rest_num: int = 20
    stage2_rho: float = 0.0         # 0 = last learned rho (reference parity,
                                    # main.py:882,1061); >0 = fixed rho_bar
    save_sol: bool = False
    theory: bool = False            # per-iteration theory-condition traces
                                    # at eval (evaluation/theory.py — the
                                    # reference's commented-out eigvalsh
                                    # analysis, main.py:900-946)

    # --- TPU-native additions (no reference counterpart) ---
    epoch_scan: bool = True         # False = per-batch dispatch over the
                                    # preloaded device stack (the whole-epoch
                                    # compiled scan has crashed the tunnelled
                                    # TPU worker on the largest workloads)
    num_devices: int = 0            # 0 = all visible devices (data-parallel)
    model_devices: int = 1          # tensor-parallel factor: shards the LSTM
                                    # hidden/gate axes over a 'model' mesh
                                    # axis (num_devices must divide by it;
                                    # XLA inserts the delta-matmul psum)
    sparse: bool = False            # sparse problem data through the solver
                                    # path (train + test)
    sparse_format: str = "bcoo"     # 'bcoo' = unstructured batched BCOO;
                                    # 'bsr' = tile-sparse Pallas matvecs
                                    # (banded/block structure — the layout
                                    # that actually cuts TPU HBM traffic,
                                    # kernels/sparse_matvec.py)
    use_pallas: bool = False        # fused Pallas LSTM-cell kernel
    gate_dtype: str = "float32"     # 'bfloat16' enables bf16 gate matmuls
    matvec_mode: str = "highest"    # KKT-feature matvecs: highest|default|bf16
    remat: bool = False             # jax.checkpoint each step in TBPTT chunks
    resume: bool = False            # resume training from the run checkpoint
    preload: str = "auto"           # train split on device once: auto|always|never
    preload_dtype: str = "float32"  # Q/A0 storage for the preloaded stack;
                                    # 'bfloat16' halves resident HBM (pairs
                                    # with matvec_mode='bf16')
    train_hours: float = 0.0        # wall-clock training budget (0 = off);
                                    # the gated best checkpoint is kept
    train_backend: str = "step"     # 'fused' = whole-segment training
                                    # megakernel (custom-VJP Pallas rollout,
                                    # lstm model, single device)
    log_every: int = 1

    def run_name(self) -> str:
        """Run-keyed checkpoint naming; one consistent order for save AND
        load (the reference swaps num_ineq/num_eq between the two,
        reference: main.py:88-92 vs 557-561 — fixed here)."""
        pt = self.prob_type
        if pt in ("QP", "QP_RHS"):
            core = f"{pt}_{self.num_var}_{self.num_ineq}_{self.num_eq}"
        elif pt == "Random_QP":
            core = f"{pt}_{self.num_var}_{self.num_ineq}"
        elif pt == "Equality_QP":
            core = f"{pt}_{self.num_var}_{self.num_eq}"
        elif pt == "SVM":
            core = f"{pt}_{self.num_var}_{self.num_ineq}"
        elif pt == "QPLIB":
            core = f"QPLIB_{self.qplib_num}"
        elif pt == "Portfolio":
            core = f"{pt}_{self.num_var}_{self.num_ineq}"
        elif pt.startswith("MM_"):
            core = f"{pt}_{self.num_var}"
        else:
            core = pt
        return f"{core}_{self.outer_T}_{self.hidden_dim}"

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "ExperimentConfig":
        if not _HAVE_YAML:
            raise RuntimeError("pyyaml not available")
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        raw.update(overrides)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "ExperimentConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**raw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
