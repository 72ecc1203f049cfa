"""Block-sparse Pallas matvec (kernels/sparse_matvec.py) vs dense."""

import jax.numpy as jnp
import numpy as np
import pytest

from iadmm_tpu.kernels.sparse_matvec import (BSRMatrix, bsr_from_dense,
                                             bsr_matvec, bsr_pair_from_dense)


def block_sparse_dense(rng, B, m, n, tile=16, frac=0.3):
    """Dense array whose nonzeros live in a random subset of tiles."""
    R, C = m // tile, n // tile
    M = np.zeros((B, m, n), np.float32)
    for b in range(B):
        mask = rng.random((R, C)) < frac
        for r in range(R):
            for c in np.flatnonzero(mask[r]):
                M[b, r * tile:(r + 1) * tile, c * tile:(c + 1) * tile] = \
                    rng.standard_normal((tile, tile))
    return M


@pytest.mark.parametrize("m,n", [(64, 96), (96, 64)])
def test_bsr_matvec_matches_dense(m, n):
    rng = np.random.default_rng(0)
    M = block_sparse_dense(rng, 3, m, n, tile=16, frac=0.3)
    v = rng.standard_normal((3, n)).astype(np.float32)
    bsr = bsr_from_dense(M, tile=(16, 32))
    y = bsr_matvec(bsr, jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.einsum("bij,bj->bi", M, v),
                               rtol=1e-5, atol=1e-5)


def test_bsr_occupancy_and_transpose():
    rng = np.random.default_rng(1)
    M = block_sparse_dense(rng, 2, 64, 64, tile=32, frac=0.25)
    fwd, bwd = bsr_pair_from_dense(M, tile=(32, 32))
    assert fwd.occupancy <= 1.0
    v = rng.standard_normal((2, 64)).astype(np.float32)
    w = rng.standard_normal((2, 64)).astype(np.float32)
    y = bsr_matvec(fwd, jnp.asarray(v), interpret=True)
    yt = bsr_matvec(bwd, jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.einsum("bij,bj->bi", M, v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yt),
                               np.einsum("bij,bi->bj", M, w), atol=1e-5)


def test_bsr_ragged_edge_padding():
    """Logical shape not tile-aligned: pad rows/cols must stay inert."""
    rng = np.random.default_rng(2)
    M = np.zeros((2, 40, 56), np.float32)
    M[:, :40, :56] = rng.standard_normal((2, 40, 56)) * \
        (rng.random((2, 40, 56)) < 0.5)
    v = rng.standard_normal((2, 56)).astype(np.float32)
    bsr = bsr_from_dense(M, tile=(16, 16))
    y = bsr_matvec(bsr, jnp.asarray(v), interpret=True)
    assert y.shape == (2, 40)
    np.testing.assert_allclose(np.asarray(y),
                               np.einsum("bij,bj->bi", M, v), atol=1e-5)
