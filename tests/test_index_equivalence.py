"""Index-batching ↔ classic-iterator golden cross-check.

Mirrors reference ``test/index_test.py:18-40``: the windows produced by the
index path must be exactly the same numbers the classic snapshot iterator
yields (the index path's x is (lags, N, F) where the classic snapshot's x is
(N, lags); the index path's y covers the next ``lags`` steps where the
classic y is the single next step).
"""

import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.data import ChickenpoxDatasetLoader
from pytorch_geometric_temporal_tpu.data._io import available
from pytorch_geometric_temporal_tpu.ops import BCSRMatrix, Graph, spmm, spmm_segment

# `available` also sees the package-bundled copy (data/_io.py), so this
# golden test runs offline instead of silently skipping.
needs_chickenpox = pytest.mark.skipif(
    not available("chickenpox.json"), reason="chickenpox.json unavailable"
)


@needs_chickenpox
def test_chickenpox_index_matches_classic():
    lags = 4
    classic = ChickenpoxDatasetLoader().get_dataset(lags=lags)
    loader = ChickenpoxDatasetLoader(index=True)
    train_dl, _, _, edges, ew = loader.get_index_dataset(
        lags=lags, batch_size=1, shuffle=False, ratio=(1.0, 0.0, 0.0)
    )
    np.testing.assert_array_equal(
        edges, np.asarray(classic[0].edge_index)
    )
    for i, (x, y) in enumerate(train_dl):
        snap = classic[i]
        # x: (1, lags, N, 1) vs classic (N, lags)
        np.testing.assert_allclose(
            np.asarray(x)[0, :, :, 0].T, np.asarray(snap.x), atol=1e-6
        )
        # y: (1, lags, N, 1); first step == classic target of snapshot i
        np.testing.assert_allclose(
            np.asarray(y)[0, 0, :, 0], np.asarray(snap.y), atol=1e-6
        )
        if i >= 20:
            break


def test_spmm_accepts_bcsr(rng):
    ei = np.unique(rng.integers(0, 40, size=(2, 200)), axis=1)
    w = rng.uniform(0.5, 1.5, ei.shape[1]).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=40)
    mat = BCSRMatrix.from_graph(g)
    import jax.numpy as jnp

    x = jnp.asarray(rng.normal(size=(40, 6)).astype(np.float32))
    np.testing.assert_allclose(
        spmm(mat, x), spmm_segment(g, x), atol=1e-4
    )
    with pytest.raises(ValueError):
        spmm(mat, x, weights=jnp.ones(mat.fwd.nnzb))
