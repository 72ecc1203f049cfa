"""Wall-clock timing helpers with proper device synchronisation.

The reference brackets ``time.time()`` around async CUDA launches
(reference: main.py:881-890) which measures dispatch, not execution; here we
``block_until_ready`` the result tree so timings are honest.
"""

from __future__ import annotations

import time

import jax


def block_tree(tree):
    return jax.tree.map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, tree)


class Timer:
    """with Timer() as t: ... ; t.elapsed (seconds, device-synced)."""

    def __init__(self, sync_tree=None):
        self._sync = sync_tree
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            block_tree(self._sync)
        self.elapsed = time.perf_counter() - self._t0
        return False
