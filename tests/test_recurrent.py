"""Shape + state-carry tests for every recurrent cell.

Mirrors the reference strategy (``test/recurrent_test.py``: Watts-Strogatz
mock graphs, uniform X, shape asserts after forward passes incl. a
state-carrying call) and adds: batched leading dims and jit-compiled calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.models import (
    AGCRN,
    A3TGCN,
    DCRNN,
    DCRNNSeq,
    DyGrEncoder,
    EvolveGCNH,
    EvolveGCNO,
    GCLSTM,
    GConvGRU,
    GConvLSTM,
    HeteroGCLSTM,
    LRGCN,
    MPNNLSTM,
    TGCN,
    split_relations,
)
from pytorch_geometric_temporal_tpu.ops import Graph

N, E, F, C = 20, 60, 8, 16


@pytest.fixture
def graph(rng):
    ei = np.unique(rng.integers(0, N, size=(2, E)), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=N)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.uniform(size=(N, F)).astype(np.float32))


key = jax.random.PRNGKey(0)


def test_gconv_gru(graph, x):
    m = GConvGRU(out_channels=C, K=2)
    params = m.init(key, x, graph)
    h = m.apply(params, x, graph)
    assert h.shape == (N, C)
    h2 = m.apply(params, x, graph, h)
    assert h2.shape == (N, C)
    # batched input, same params
    xb = jnp.stack([x, x * 2])
    hb = m.apply(params, xb, graph)
    assert hb.shape == (2, N, C)
    np.testing.assert_allclose(hb[0], h, atol=1e-5)


def test_gconv_gru_normalizations(graph, x):
    for norm in ["sym", "rw", None]:
        m = GConvGRU(out_channels=C, K=3, normalization=norm)
        params = m.init(key, x, graph, None, 2.0)
        h = m.apply(params, x, graph, None, 2.0)
        assert h.shape == (N, C)


def test_gconv_lstm(graph, x):
    m = GConvLSTM(out_channels=C, K=2)
    params = m.init(key, x, graph)
    h, c = m.apply(params, x, graph)
    assert h.shape == (N, C) and c.shape == (N, C)
    h2, c2 = m.apply(params, x, graph, h, c)
    assert h2.shape == (N, C)


def test_gc_lstm(graph, x):
    m = GCLSTM(out_channels=C, K=2)
    params = m.init(key, x, graph)
    h, c = m.apply(params, x, graph)
    h, c = m.apply(params, x, graph, h, c)
    assert h.shape == (N, C) and c.shape == (N, C)


def test_dcrnn_cell(graph, x):
    m = DCRNN(out_channels=C, K=3)
    params = m.init(key, x, graph)
    h = m.apply(params, x, graph)
    h = m.apply(params, x, graph, h)
    assert h.shape == (N, C)


def test_dcrnn_seq(graph, rng):
    B, T = 4, 6
    xs = jnp.asarray(rng.uniform(size=(B, T, N, F)).astype(np.float32))
    m = DCRNNSeq(out_channels=C, K=2)
    params = m.init(key, xs, graph)
    out = m.apply(params, xs, graph)
    assert out.shape == (B, T, N, C)


def test_dcrnn_seq_matches_cell_loop(graph, rng):
    """Seq2seq scan must equal stepping the cell manually (BatchedDCRNN ≡
    per-step DCRNN, the equivalence the reference needed block-diagonal
    batching for)."""
    B, T = 2, 3
    xs = jnp.asarray(rng.uniform(size=(B, T, N, F)).astype(np.float32))
    seq = DCRNNSeq(out_channels=C, K=2)
    params = seq.init(key, xs, graph)
    out = seq.apply(params, xs, graph)
    cell = DCRNN(out_channels=C, K=2)
    cell_params = {"params": params["params"]["cell"]}
    h = None
    for t in range(T):
        h = cell.apply(cell_params, xs[:, t], graph, h)
        np.testing.assert_allclose(out[:, t], h, atol=1e-5)


def test_tgcn(graph, x):
    m = TGCN(out_channels=C)
    params = m.init(key, x, graph)
    h = m.apply(params, x, graph)
    h = m.apply(params, x, graph, h)
    assert h.shape == (N, C)
    # TGCN2-style batched
    xb = jnp.stack([x, x])
    hb = m.apply(params, xb, graph)
    assert hb.shape == (2, N, C)


def test_a3tgcn(graph, rng):
    T = 5
    xt = jnp.asarray(rng.uniform(size=(N, F, T)).astype(np.float32))
    m = A3TGCN(out_channels=C, periods=T)
    params = m.init(key, xt, graph)
    h = m.apply(params, xt, graph)
    assert h.shape == (N, C)
    # batched (A3TGCN2 semantics)
    xbt = jnp.stack([xt, xt])
    hb = m.apply(params, xbt, graph)
    assert hb.shape == (2, N, C)
    np.testing.assert_allclose(hb[0], h, atol=1e-5)


def test_agcrn(rng):
    B, D = 4, 6
    xb = jnp.asarray(rng.uniform(size=(B, N, F)).astype(np.float32))
    e = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
    m = AGCRN(number_of_nodes=N, out_channels=C, K=2, embedding_dimensions=D)
    params = m.init(key, xb, e)
    h = m.apply(params, xb, e)
    h = m.apply(params, xb, e, h)
    assert h.shape == (B, N, C)


def test_lrgcn(rng, x):
    R = 3
    ei = rng.integers(0, N, size=(2, E))
    et = rng.integers(0, R, size=E)
    rels = split_relations(ei, et, R, N)
    m = LRGCN(out_channels=C, num_relations=R, num_bases=2)
    params = m.init(key, x, rels)
    h, c = m.apply(params, x, rels)
    h, c = m.apply(params, x, rels, h, c)
    assert h.shape == (N, C) and c.shape == (N, C)


def test_dygrae(graph, x):
    m = DyGrEncoder(
        conv_out_channels=C, conv_num_layers=2, conv_aggr="add",
        lstm_out_channels=C, lstm_num_layers=1,
    )
    params = m.init(key, x, graph)
    h_tilde, h, c = m.apply(params, x, graph)
    assert h_tilde.shape == (N, C) and h.shape == (N, C)
    h_tilde, h, c = m.apply(params, x, graph, h, c)
    assert h_tilde.shape == (N, C)


@pytest.mark.parametrize("aggr", ["mean", "max"])
def test_dygrae_aggrs(graph, x, aggr):
    m = DyGrEncoder(
        conv_out_channels=C, conv_num_layers=1, conv_aggr=aggr,
        lstm_out_channels=C, lstm_num_layers=2,
    )
    params = m.init(key, x, graph)
    h_tilde, h, c = m.apply(params, x, graph)
    assert h.shape == (2, N, C)


def test_evolvegcno(graph, rng):
    x = jnp.asarray(rng.uniform(size=(N, F)).astype(np.float32))
    m = EvolveGCNO(in_channels=F)
    params = m.init(key, x, graph)
    out, w = m.apply(params, x, graph)
    assert out.shape == (N, F) and w.shape == (F, F)
    out2, w2 = m.apply(params, x, graph, w)
    assert not np.allclose(w, w2)


def test_evolvegcnh(graph, rng):
    x = jnp.asarray(rng.uniform(size=(N, F)).astype(np.float32))
    m = EvolveGCNH(num_of_nodes=N, in_channels=F)
    params = m.init(key, x, graph)
    out, w = m.apply(params, x, graph)
    assert out.shape == (N, F) and w.shape == (F, F)


def test_mpnn_lstm(graph, rng):
    window = 1
    x = jnp.asarray(rng.uniform(size=(N, F)).astype(np.float32))
    m = MPNNLSTM(hidden_size=C, num_nodes=N, window=window, dropout=0.5)
    variables = m.init(key, x, graph)
    out = m.apply(variables, x, graph)
    assert out.shape == (N, 2 * C + F + window - 1)
    # train mode with batch stats mutation + dropout rng
    out, updates = m.apply(
        variables, x, graph, True,
        mutable=["batch_stats"], rngs={"dropout": key},
    )
    assert "batch_stats" in updates


def test_hetero_gclstm(rng):
    n_a, n_b, fa, fb = 10, 7, 5, 3
    x_dict = {
        "a": jnp.asarray(rng.uniform(size=(n_a, fa)).astype(np.float32)),
        "b": jnp.asarray(rng.uniform(size=(n_b, fb)).astype(np.float32)),
    }
    ei_ab = np.stack([rng.integers(0, n_a, 15), rng.integers(0, n_b, 15)])
    ei_ba = np.stack([rng.integers(0, n_b, 12), rng.integers(0, n_a, 12)])
    metadata = (["a", "b"], [("a", "to", "b"), ("b", "to", "a")])
    edge_graphs = {
        ("a", "to", "b"): Graph.from_edge_index(
            ei_ab, num_nodes=n_b, num_src=n_a
        ),
        ("b", "to", "a"): Graph.from_edge_index(
            ei_ba, num_nodes=n_a, num_src=n_b
        ),
    }
    m = HeteroGCLSTM(
        in_channels_dict={"a": fa, "b": fb}, out_channels=C, metadata=metadata
    )
    params = m.init(key, x_dict, edge_graphs)
    h, c = m.apply(params, x_dict, edge_graphs)
    assert h["a"].shape == (n_a, C) and h["b"].shape == (n_b, C)
    h, c = m.apply(params, x_dict, edge_graphs, h, c)
    assert c["a"].shape == (n_a, C)


def test_cells_are_jittable(graph, x):
    m = GConvGRU(out_channels=C, K=2)
    params = m.init(key, x, graph)

    @jax.jit
    def step(p, x_, g):
        return m.apply(p, x_, g)

    h = step(params, x, graph)
    assert h.shape == (N, C)


def test_evolvegcno_seq(graph, rng):
    from pytorch_geometric_temporal_tpu.models import EvolveGCNO, EvolveGCNOSeq

    T = 5
    xs = jnp.asarray(rng.uniform(size=(T, N, F)).astype(np.float32))
    seq = EvolveGCNOSeq(in_channels=F)
    params = seq.init(key, xs, graph)
    outs = seq.apply(params, xs, graph)
    assert outs.shape == (T, N, F)
    # equivalence with manual weight threading through the cell
    cell = EvolveGCNO(in_channels=F)
    cp = {"params": params["params"]["cell"]}
    w = None
    for t in range(T):
        out, w = cell.apply(cp, xs[t], graph, w)
        np.testing.assert_allclose(outs[t], out, atol=1e-5)


def test_evolvegcno_seq_dynamic(rng):
    from pytorch_geometric_temporal_tpu.models import EvolveGCNOSeq
    from pytorch_geometric_temporal_tpu.ops import stack_graphs

    T = 4
    graphs = []
    for _ in range(T):
        ei = np.unique(rng.integers(0, N, size=(2, rng.integers(30, 60))), axis=1)
        graphs.append(Graph.from_edge_index(ei, num_nodes=N))
    gstack = stack_graphs(graphs)
    xs = jnp.asarray(rng.uniform(size=(T, N, F)).astype(np.float32))
    seq = EvolveGCNOSeq(in_channels=F)
    params = seq.init(key, xs, gstack)
    outs = seq.apply(params, xs, gstack)
    assert outs.shape == (T, N, F)


def test_evolvegcnh_seq(graph, rng):
    from pytorch_geometric_temporal_tpu.models import EvolveGCNH, EvolveGCNHSeq

    T = 5
    xs = jnp.asarray(rng.uniform(size=(T, N, F)).astype(np.float32))
    seq = EvolveGCNHSeq(num_of_nodes=N, in_channels=F)
    params = seq.init(key, xs, graph)
    outs = seq.apply(params, xs, graph)
    assert outs.shape == (T, N, F)
    # equivalence with manual weight threading through the cell
    cell = EvolveGCNH(num_of_nodes=N, in_channels=F)
    cp = {"params": params["params"]["cell"]}
    w = None
    for t in range(T):
        out, w = cell.apply(cp, xs[t], graph, w)
        np.testing.assert_allclose(outs[t], out, atol=1e-5)


def test_evolvegcnh_seq_dynamic(rng):
    from pytorch_geometric_temporal_tpu.models import EvolveGCNHSeq
    from pytorch_geometric_temporal_tpu.ops import stack_graphs

    T = 4
    graphs = []
    for _ in range(T):
        ei = np.unique(rng.integers(0, N, size=(2, rng.integers(30, 60))), axis=1)
        graphs.append(Graph.from_edge_index(ei, num_nodes=N))
    gstack = stack_graphs(graphs)
    xs = jnp.asarray(rng.uniform(size=(T, N, F)).astype(np.float32))
    seq = EvolveGCNHSeq(num_of_nodes=N, in_channels=F)
    params = seq.init(key, xs, gstack)
    outs = seq.apply(params, xs, gstack)
    assert outs.shape == (T, N, F)
