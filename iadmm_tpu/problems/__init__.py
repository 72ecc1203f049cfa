from .generators import (FAMILIES, RawDataset, generate, generate_qp,
                         generate_qp_rhs, generate_random_qp,
                         generate_equality_qp, generate_svm)
from .oracle import OracleResult, label_dataset, solve_qp, HAVE_OSQP
from .io import (save_npz, load_npz, load_dataset, dataset_path, load_reference_gz_dir,
                 to_qp_batch, split_ids)

__all__ = [
    "FAMILIES", "RawDataset", "generate", "generate_qp", "generate_qp_rhs",
    "generate_random_qp", "generate_equality_qp", "generate_svm",
    "OracleResult", "label_dataset", "solve_qp", "HAVE_OSQP",
    "save_npz", "load_npz", "load_dataset", "dataset_path", "load_reference_gz_dir",
    "to_qp_batch", "split_ids",
]
