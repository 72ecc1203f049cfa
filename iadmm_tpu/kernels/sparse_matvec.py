"""Block-sparse (BSR) batched matvec as a Pallas TPU kernel.

Unstructured element-sparsity does not map to the TPU: a random 10%-dense
matrix still touches every 128-lane tile, so gather-based CSR/BCOO matvecs
(kernels/sparse.py BCOO path, lowered by XLA to scatter/gathers) win nothing
on HBM traffic.  What the hardware *can* exploit is **tile-level** sparsity:
store only the (TM × TN) tiles that contain nonzeros and stream just those
through the VPU/MXU.  For block-structured constraint matrices (banded SVM
features, block-diagonal multi-stage QPs, arrow patterns) the HBM bytes —
which bound the whole ADMM step — drop by the tile-occupancy factor.

Format (per batch instance, per row-tile): a padded list of up to K active
column-tile indices with their (TM, TN) value tiles.  Pad tiles are zeros
with column 0 — numerically inert.

The dense baseline this replaces is ``solvers.step.bmv`` (reference surface:
``torch.bmm`` KKT matvecs, models/lstm.py:67-72).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Batched block-sparse matrix in padded BSR-like form.

    vals: (B, R, K, TM, TN) — value tiles (zero-padded)
    cols: (B, R, K) int32  — column-tile index per stored tile
    shape: static (m, n) logical shape (metadata field)
    """
    vals: jax.Array
    cols: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def tile(self) -> Tuple[int, int]:
        return self.vals.shape[-2], self.vals.shape[-1]

    @property
    def occupancy(self) -> float:
        """Stored tiles / total tiles (the HBM-traffic factor vs dense):
        K stored column-tiles per row-tile over Cn total column-tiles."""
        B, R, K = self.cols.shape
        tm, tn = self.tile
        cn = _round_up(self.shape[1], tn) // tn
        return K / max(cn, 1)


def bsr_tiles_host(M: np.ndarray, tile: Tuple[int, int] = (128, 128),
                   min_k: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side tiling of a (B, m, n) dense batch into padded BSR
    ``(vals, cols)`` numpy arrays; K is the max active column-tile count
    over all (instance, row-tile) pairs, or ``min_k`` if larger."""
    M = np.asarray(M)
    B, m, n = M.shape
    tm, tn = tile
    mp, np_ = _round_up(m, tm), _round_up(n, tn)
    Mp = np.zeros((B, mp, np_), M.dtype)
    Mp[:, :m, :n] = M
    R, Cn = mp // tm, np_ // tn
    tiles = Mp.reshape(B, R, tm, Cn, tn).transpose(0, 1, 3, 2, 4)
    active = tiles.reshape(B, R, Cn, -1).any(axis=-1)      # (B, R, Cn)
    K = max(int(active.sum(axis=-1).max()), 1, min_k)
    K = min(K, Cn)
    # Stable argsort of ~active lists the active column tiles first, in
    # ascending column order — the vectorized form of the per-(b, r)
    # np.flatnonzero gather (the python double loop was the dominant cost
    # of the round-4 sparse route's per-epoch reconversion).
    order = np.argsort(~active, axis=-1, kind="stable")[:, :, :K]  # (B,R,K)
    taken = np.take_along_axis(active, order, axis=-1)
    vals = np.take_along_axis(tiles, order[..., None, None], axis=2)
    vals = np.where(taken[..., None, None], vals, 0)
    cols = np.where(taken, order, 0).astype(np.int32)
    return vals, cols


def bsr_pad_k(vals: np.ndarray, cols: np.ndarray,
              K: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad host BSR arrays to K stored tiles per row-tile (zero tiles at
    column 0 — numerically inert), so batches converted with different
    per-batch K share one compiled program shape."""
    k0 = vals.shape[2]
    if k0 >= K:
        return vals, cols
    pad = [(0, 0)] * vals.ndim
    pad[2] = (0, K - k0)
    return (np.pad(vals, pad), np.pad(cols, [(0, 0), (0, 0), (0, K - k0)]))


def bsr_from_dense(M: np.ndarray, tile: Tuple[int, int] = (128, 128),
                   dtype=jnp.float32, min_k: int = 0) -> BSRMatrix:
    """Dense (B, m, n) batch -> device-resident :class:`BSRMatrix`.
    ``min_k`` floors the padded tile count K so batches of one family hit
    one compiled matvec program (train/preload.py sparse cache)."""
    M = np.asarray(M)
    vals, cols = bsr_tiles_host(M, tile, min_k=min_k)
    return BSRMatrix(vals=jnp.asarray(vals, dtype), cols=jnp.asarray(cols),
                     shape=(M.shape[-2], M.shape[-1]))


def _bsr_matvec_kernel(cols_ref, vals_ref, v_ref, out_ref, acc,
                       *, K: int, TM: int, TN: int):
    r = pl.program_id(1)
    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        col = cols_ref[0, r, k]
        seg = v_ref[0, 0, pl.ds(col * TN, TN)].reshape(1, TN)
        tile = vals_ref[0, 0, k]
        # bf16 tiles: bf16 x bf16 MXU dot with f32 accumulate (same
        # contract as the dense bf16 fast profile, solvers/step.bmv)
        acc[...] += jax.lax.dot_general(
            seg.astype(tile.dtype), tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, K, body, 0, unroll=False)
    out_ref[0, 0, 0] = acc[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec(bsr: BSRMatrix, v: jax.Array,
               interpret: bool = False) -> jax.Array:
    """y = M @ v batched: (B, m, n) ⊙ (B, n) -> (B, m), reading only the
    stored tiles.  ``v`` is padded and kept whole in VMEM (n is at most a
    few thousand for the QP families — KBs).

    Block-spec shapes obey the Mosaic rule that the last two dims of every
    block are tile-aligned or equal to the array dims: cols ride as one
    full (R, K) SMEM block per instance, v gets a singleton axis so its
    block is (1, n_pad), and the output is (B, R, 1, TM) so each grid step
    owns an exactly-shaped (1, TM) slab."""
    B, R, K, TM, TN = bsr.vals.shape
    m, n = bsr.shape
    n_pad = _round_up(n, TN)
    v_p = jnp.pad(v.astype(jnp.float32),
                  ((0, 0), (0, n_pad - n)))[:, None, :]

    out = pl.pallas_call(
        functools.partial(_bsr_matvec_kernel, K=K, TM=TM, TN=TN),
        grid=(B, R),
        in_specs=[
            pl.BlockSpec((1, R, K), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K, TM, TN), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TM), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, 1, TM), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TM), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * K * TM * TN,
            bytes_accessed=B * R * K * TM * TN * bsr.vals.dtype.itemsize
            + 4 * B * (n_pad + R * TM),
            transcendentals=0),
        interpret=interpret,
    )(bsr.cols, bsr.vals, v_p)
    return out.reshape(B, R * TM)[:, :m]


def _zero_ct(x):
    """Zero cotangent with JAX's dtype rules (float0 for integer leaves)."""
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bsr_matvec_ad(M: BSRMatrix, MT: BSRMatrix, v: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Differentiable (in ``v``) BSR matvec: y = M @ v with the VJP
    dv = Mᵀ @ ȳ computed by a second BSR kernel over the stored transpose
    operand ``MT`` (Pallas kernels have no automatic JVP/VJP; the matrices
    are problem data and get zero cotangents)."""
    return bsr_matvec(M, v, interpret=interpret)


def _bsr_ad_fwd(M, MT, v, interpret):
    return bsr_matvec(M, v, interpret=interpret), (M, MT)


def _bsr_ad_bwd(interpret, res, g):
    M, MT = res
    dv = bsr_matvec(MT, g, interpret=interpret)
    return (jax.tree.map(_zero_ct, M), jax.tree.map(_zero_ct, MT), dv)


bsr_matvec_ad.defvjp(_bsr_ad_fwd, _bsr_ad_bwd)


def bsr_pair_from_dense(M: np.ndarray, tile: Tuple[int, int] = (128, 128),
                        dtype=jnp.float32) -> Tuple[BSRMatrix, BSRMatrix]:
    """(M, Mᵀ) in BSR form — the ADMM step needs both A0·x and A0ᵀ·y; the
    transpose is a second first-class BSR operand, not a kernel mode."""
    M = np.asarray(M)
    return (bsr_from_dense(M, tile, dtype),
            bsr_from_dense(M.transpose(0, 2, 1), tile, dtype))
