"""Profiling + debug observability (SURVEY.md §5 tracing row).

The reference's only tracing is wall-clock ``time.time()`` brackets
(reference: main.py:881-890).  Here:

  * :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
    loadable profile (XLA op breakdown, HBM usage) for any code region;
  * :func:`annotate` — named trace annotation for host-side phases;
  * :func:`enable_nan_checks` — dev-mode ``jax_debug_nans`` toggle;
  * :class:`StepTimer` — running per-phase wall-clock aggregation with a
    host-fetch completion barrier (honest on async dispatch backends).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

import jax
import numpy as np

_logged_once: set = set()


def log_once(key: str, msg: str) -> None:
    """Print ``msg`` at most once per process (keyed diagnostics that would
    otherwise spam per-epoch loops)."""
    if key not in _logged_once:
        _logged_once.add(key)
        print(msg, flush=True)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: with trace('/tmp/prof'): run_step(...)"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in the profile timeline."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def start_compile_watchdog(label: str, budget_s: float = 120.0,
                           hint: str = ""):
    """Warn (once) if a first-dispatch/compile region exceeds ``budget_s``;
    returns a zero-arg ``cancel`` callable to invoke after the region.

    Encodes the compile-time policy for this backend: XLA/Mosaic compiles
    are erratic under chip contention (seconds to ~8 min for the same
    program, persistent cache ineffective — CLAUDE.md).  A pathological
    compile should be *visible* with an actionable fallback, not a silent
    hang.  Purely observational — never cancels the compile."""
    import threading

    done = threading.Event()

    def _warn():
        if not done.wait(budget_s):
            print(f"[compile-watchdog] {label}: first dispatch still "
                  f"compiling after {budget_s:.0f}s — likely chip "
                  f"contention (another TPU job compiling?). "
                  + (hint or "It should complete; consider the XLA step "
                             "path (use_pallas=false) if this recurs."),
                  flush=True)

    threading.Thread(target=_warn, daemon=True).start()
    return done.set


@contextlib.contextmanager
def compile_watchdog(label: str, budget_s: float = 120.0, hint: str = ""):
    """Context-manager form of :func:`start_compile_watchdog`."""
    cancel = start_compile_watchdog(label, budget_s, hint)
    try:
        yield
    finally:
        cancel()


def fetch_barrier(tree) -> None:
    """Force completion of every leaf via a tiny device->host transfer.
    ``block_until_ready`` alone can return early on tunnelled backends."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


class StepTimer:
    """Accumulate per-phase wall-clock with device synchronisation.

    timer = StepTimer()
    with timer.phase('scaling', result_tree=scaled): ...
    timer.summary() -> {'scaling': {'total': s, 'count': k, 'mean': s/k}}
    """

    def __init__(self):
        self._acc: Dict[str, list] = collections.defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            sync = box.get("result", result_tree)
            if sync is not None:
                fetch_barrier(sync)
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: dict(total=float(np.sum(v)), count=len(v),
                        mean=float(np.mean(v)))
                for k, v in self._acc.items()}
