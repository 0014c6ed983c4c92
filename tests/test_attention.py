"""Shape tests for the attention model family (mirrors reference
``test/attention_test.py`` shapes and configurations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.models import (
    AAGCN,
    ASTGCN,
    DNNTSP,
    GMAN,
    MSTGCN,
    MTGNN,
    STConv,
)
from pytorch_geometric_temporal_tpu.models.attention import (
    ChebConvAttention,
    SpatialAttention,
    TemporalAttention,
)
from pytorch_geometric_temporal_tpu.ops import Graph

key = jax.random.PRNGKey(0)


def make_graph(rng, n, e=None):
    e = e or 3 * n
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
    return Graph.from_edge_index(ei, w, num_nodes=n)


def test_stconv(rng):
    B, T, N, F = 2, 12, 30, 8
    g = make_graph(rng, N)
    x = jnp.asarray(rng.uniform(size=(B, T, N, F)).astype(np.float32))
    m = STConv(num_nodes=N, hidden_channels=16, out_channels=24,
               kernel_size=3, K=2)
    variables = m.init(key, x, g)
    out = m.apply(variables, x, g)
    assert out.shape == (B, T - 2 * (3 - 1), N, 24)
    # train mode mutates per-node batch stats
    out, updates = m.apply(variables, x, g, None, True,
                           mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_chebconv_attention(rng):
    B, N, F, C = 4, 20, 8, 16
    g = make_graph(rng, N)
    x = jnp.asarray(rng.uniform(size=(B, N, F)).astype(np.float32))
    s = jax.nn.softmax(
        jnp.asarray(rng.uniform(size=(B, N, N)).astype(np.float32)), axis=1
    )
    for norm in [None, "sym", "rw"]:
        m = ChebConvAttention(out_channels=C, K=3, normalization=norm)
        variables = m.init(key, x, g, s)
        out = m.apply(variables, x, g, s)
        assert out.shape == (B, N, C)


def test_astgcn(rng):
    B, N, F, T = 2, 20, 4, 12
    g = make_graph(rng, N)
    x = jnp.asarray(rng.uniform(size=(B, N, F, T)).astype(np.float32))
    m = ASTGCN(nb_block=2, in_channels=F, K=3, nb_chev_filter=8,
               nb_time_filter=8, time_strides=2, num_for_predict=5,
               len_input=T, num_of_vertices=N, normalization="sym")
    variables = m.init(key, x, g)
    out = m.apply(variables, x, g)
    assert out.shape == (B, N, 5)


def test_astgcn_dynamic_edges(rng):
    B, N, F, T = 2, 15, 4, 8
    graphs = [make_graph(rng, N) for _ in range(T)]
    x = jnp.asarray(rng.uniform(size=(B, N, F, T)).astype(np.float32))
    m = ASTGCN(nb_block=1, in_channels=F, K=2, nb_chev_filter=8,
               nb_time_filter=8, time_strides=1, num_for_predict=3,
               len_input=T, num_of_vertices=N, normalization=None)
    variables = m.init(key, x, graphs)
    out = m.apply(variables, x, graphs)
    assert out.shape == (B, N, 3)


def test_mstgcn(rng):
    B, N, F, T = 2, 20, 4, 12
    g = make_graph(rng, N)
    x = jnp.asarray(rng.uniform(size=(B, N, F, T)).astype(np.float32))
    m = MSTGCN(nb_block=2, in_channels=F, K=3, nb_chev_filter=8,
               nb_time_filter=8, time_strides=2, num_for_predict=6,
               len_input=T)
    variables = m.init(key, x, g)
    out = m.apply(variables, x, g)
    assert out.shape == (B, N, 6)


def test_gman(rng):
    B, N, T_his, T_pred = 2, 10, 6, 4
    K, d = 2, 4
    x = jnp.asarray(rng.uniform(size=(B, T_his, N)).astype(np.float32))
    se = jnp.asarray(rng.uniform(size=(N, K * d)).astype(np.float32))
    te = jnp.asarray(
        rng.integers(0, 7, size=(B, T_his + T_pred, 2)).astype(np.float32)
    )
    m = GMAN(L=1, K=K, d=d, num_his=T_his, bn_decay=0.1, steps_per_day=288,
             use_bias=True, mask=True)
    variables = m.init(key, x, se, te)
    out = m.apply(variables, x, se, te)
    assert out.shape == (B, T_pred, N)


def test_mtgnn(rng):
    B, N, F, T = 2, 20, 2, 12
    x = jnp.asarray(rng.uniform(size=(B, F, N, T)).astype(np.float32))
    m = MTGNN(gcn_true=True, build_adj=True, gcn_depth=2, num_nodes=N,
              kernel_set=[2, 3, 6, 7], kernel_size=7, dropout=0.1,
              subgraph_size=5, node_dim=4, dilation_exponential=1,
              conv_channels=8, residual_channels=8, skip_channels=16,
              end_channels=32, seq_length=T, in_dim=F, out_dim=3, layers=2,
              propalpha=0.05, tanhalpha=3.0, layer_norm_affline=True)
    variables = m.init(key, x)
    out = m.apply(variables, x)
    assert out.shape == (B, 3, N, 1)


def test_mtgnn_fixed_adj_and_static_features(rng):
    B, N, F, T = 2, 15, 2, 12
    xd = 6
    x = jnp.asarray(rng.uniform(size=(B, F, N, T)).astype(np.float32))
    a = jnp.asarray(rng.uniform(size=(N, N)).astype(np.float32))
    fe = jnp.asarray(rng.uniform(size=(N, xd)).astype(np.float32))
    # fixed adjacency (build_adj=False)
    m = MTGNN(gcn_true=True, build_adj=False, gcn_depth=1, num_nodes=N,
              kernel_set=[2, 3], kernel_size=3, dropout=0.0,
              subgraph_size=4, node_dim=4, dilation_exponential=2,
              conv_channels=4, residual_channels=4, skip_channels=8,
              end_channels=16, seq_length=T, in_dim=F, out_dim=2, layers=2,
              propalpha=0.05, tanhalpha=3.0, layer_norm_affline=False)
    variables = m.init(key, x, a)
    out = m.apply(variables, x, a)
    assert out.shape == (B, 2, N, 1)
    # learned adjacency from static features
    m2 = MTGNN(gcn_true=True, build_adj=True, gcn_depth=1, num_nodes=N,
               kernel_set=[2, 3], kernel_size=3, dropout=0.0,
               subgraph_size=4, node_dim=4, dilation_exponential=2,
               conv_channels=4, residual_channels=4, skip_channels=8,
               end_channels=16, seq_length=T, in_dim=F, out_dim=2, layers=2,
               propalpha=0.05, tanhalpha=3.0, layer_norm_affline=True, xd=xd)
    variables = m2.init(key, x, None, None, fe)
    out = m2.apply(variables, x, None, None, fe)
    assert out.shape == (B, 2, N, 1)


def test_aagcn(rng):
    B, C, T, V = 2, 4, 16, 21
    ei = np.unique(rng.integers(0, V, size=(2, 40)), axis=1)
    x = jnp.asarray(rng.uniform(size=(B, C, T, V)).astype(np.float32))
    for adaptive in (True, False):
        for attention in (True, False):
            m = AAGCN(in_channels=C, out_channels=16,
                      edge_index=tuple(map(tuple, ei)), num_nodes=V,
                      stride=2, adaptive=adaptive, attention=attention)
            variables = m.init(key, x)
            out = m.apply(variables, x)
            assert out.shape == (B, 16, T // 2, V)


def test_dnntsp(rng):
    # graph spans T·items nodes (reference test/attention_test.py:735-747)
    items, F, T = 10, 8, 4
    g = make_graph(rng, T * items)
    x = jnp.asarray(rng.uniform(size=(T * items, F)).astype(np.float32))
    m = DNNTSP(items_total=items, item_embedding_dim=F, n_heads=2)
    variables = m.init(key, x, g)
    out = m.apply(variables, x, g)
    assert out.shape == (T, items, F)
