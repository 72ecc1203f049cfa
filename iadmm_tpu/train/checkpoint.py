"""Checkpointing: params + optimizer state + bookkeeping.

Upgrades the reference's save-only ``torch.save(state_dict)``
(reference: utils.py:46-47) to full resume state (params, optax state,
epoch, best metric) via Orbax, with a NumPy-pickle fallback when Orbax is
unavailable.  Paths are run-keyed exactly like the reference
(reference: main.py:81-166) through ``ExperimentConfig.run_name()``.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

# Non-array metadata keys stored in a JSON sidecar (Orbax tensorstore can
# only hold numeric arrays).
_META_KEYS = ("epoch", "best", "config")


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """payload: {'params': ..., 'opt_state': ..., 'epoch': int,
    'config': dict, ...} — array trees go to Orbax (or pickle fallback),
    scalar/str metadata to a JSON sidecar."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    meta = {k: payload[k] for k in _META_KEYS if k in payload}
    arrays = {k: v for k, v in payload.items() if k not in _META_KEYS}
    host = _to_numpy(arrays)
    if _HAVE_ORBAX and not path.endswith(".pkl"):
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), host, force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    else:
        with open(path, "wb") as f:
            pickle.dump({**host, **meta}, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path) and _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        out = dict(ckptr.restore(os.path.abspath(path)))
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                out.update(json.load(f))
        return out
    with open(path, "rb") as f:
        return pickle.load(f)


def checkpoint_path(save_dir: str, model_name: str, run_name: str,
                    pickle_fallback: bool = False) -> str:
    ext = ".pkl" if (pickle_fallback or not _HAVE_ORBAX) else ""
    return os.path.join(save_dir, model_name, "params", run_name + ext)
