"""Golden numerical cross-checks for the round-2 model batch.

Same methodology as test_golden_torch.py: each model is re-implemented in
plain dense torch (float64, written from the documented math — independent
of both the reference's torch_geometric code and our JAX code), loaded with
OUR initialized parameters, and the activations asserted allclose.  A
transposed weight, swapped gate, or wrong normalization in either
implementation fails these.

Includes the DCRNN ``compat='reference'`` golden: an independent torch
implementation of the reference's exact (quirky) DConv algorithm
(unweighted messages, misaligned reverse norms, frozen Chebyshev Tx_0 —
reference ``nn/recurrent/dcrnn.py:59-106``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pytorch_geometric_temporal_tpu.models import (
    A3TGCN,
    AGCRN,
    DCRNN,
    DyGrEncoder,
    EvolveGCNH,
    EvolveGCNO,
    GCLSTM,
    GConvLSTM,
    LRGCN,
    MPNNLSTM,
)
from pytorch_geometric_temporal_tpu.models.recurrent.lrgcn import split_relations
from pytorch_geometric_temporal_tpu.ops import Graph

from test_golden_torch import torch_cheb_basis

N, E, F, C, K = 11, 35, 5, 7, 3


def t64(a):
    return torch.as_tensor(np.asarray(a), dtype=torch.float64)


def sig(a):
    return torch.sigmoid(a)


@pytest.fixture
def setup(rng):
    # ring edges both ways guarantee nonzero in/out degree everywhere
    ring = np.stack([np.arange(N), (np.arange(N) + 1) % N])
    extra = rng.integers(0, N, size=(2, E))
    ei = np.unique(
        np.concatenate([ring, ring[::-1], extra], axis=1), axis=1
    )
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float64)
    a = np.zeros((N, N))
    a[ei[0], ei[1]] = w  # A[s, r]
    x = rng.normal(size=(N, F)).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=N)
    return g, a, x


def torch_gcn_norm(a):
    """out[r] = sum_s norm[r, s] x[s] with Ã = A + I, sym-normalized."""
    at = torch.as_tensor(a.T) + torch.eye(a.shape[0], dtype=torch.float64)
    deg = at.sum(1)
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    return dis[:, None] * at * dis[None, :]


def flax_gru(p, h, x):
    """Independent torch mirror of flax.linen.GRUCell math."""
    def d(name, v):
        out = v @ t64(p[name]["kernel"])
        if "bias" in p[name]:
            out = out + t64(p[name]["bias"])
        return out

    r = sig(d("ir", x) + d("hr", h))
    z = sig(d("iz", x) + d("hz", h))
    n = torch.tanh(d("in", x) + r * d("hn", h))
    return (1.0 - z) * n + z * h


def flax_lstm(p, c, h, x):
    """Independent torch mirror of flax.linen.OptimizedLSTMCell math."""
    def d(name, v):
        out = v @ t64(p[name]["kernel"])
        if "bias" in p[name]:
            out = out + t64(p[name]["bias"])
        return out

    i = sig(d("ii", x) + d("hi", h))
    f = sig(d("if", x) + d("hf", h))
    g_ = torch.tanh(d("ig", x) + d("hg", h))
    o = sig(d("io", x) + d("ho", h))
    c_new = f * c + i * g_
    return c_new, o * torch.tanh(c_new)


# ---------------------------------------------------------------------------
# GConvLSTM / GCLSTM
# ---------------------------------------------------------------------------


def test_gconvlstm_matches_torch(setup):
    g, a, x = setup
    rng2 = np.random.default_rng(1)
    h = rng2.normal(size=(N, C)).astype(np.float32)
    c = rng2.normal(size=(N, C)).astype(np.float32)
    m = GConvLSTM(out_channels=C, K=K)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    h_ours, c_ours = m.apply(
        params, jnp.asarray(x), g, jnp.asarray(h), jnp.asarray(c)
    )

    p = params["params"]
    bx = torch_cheb_basis(a, x, K)
    bh = torch_cheb_basis(a, h, K)
    ct = t64(c)

    def conv_pair(name):
        return (bx @ t64(p[f"w_x{name}"]) + bh @ t64(p[f"w_h{name}"])
                + t64(p[f"b_conv_{name}"]))

    i = sig(conv_pair("i") + t64(p["w_ci"]) * ct + t64(p["b_i"]))
    f = sig(conv_pair("f") + t64(p["w_cf"]) * ct + t64(p["b_f"]))
    c_new = f * ct + i * torch.tanh(conv_pair("c") + t64(p["b_c"]))
    o = sig(conv_pair("o") + t64(p["w_co"]) * c_new + t64(p["b_o"]))
    h_new = o * torch.tanh(c_new)
    np.testing.assert_allclose(np.asarray(h_ours), h_new.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ours), c_new.numpy(), atol=1e-4)


def test_gclstm_matches_torch(setup):
    g, a, x = setup
    rng2 = np.random.default_rng(2)
    h = rng2.normal(size=(N, C)).astype(np.float32)
    c = rng2.normal(size=(N, C)).astype(np.float32)
    m = GCLSTM(out_channels=C, K=K)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    h_ours, c_ours = m.apply(
        params, jnp.asarray(x), g, jnp.asarray(h), jnp.asarray(c)
    )

    p = params["params"]
    bh = torch_cheb_basis(a, h, K)
    xt, ct = t64(x), t64(c)

    def gate(name):
        return (xt @ t64(p[f"W_{name}"]) + bh @ t64(p[f"w_conv_{name}"])
                + t64(p[f"b_conv_{name}"]) + t64(p[f"b_{name}"]))

    i, f, o = sig(gate("i")), sig(gate("f")), sig(gate("o"))
    c_new = f * ct + i * torch.tanh(gate("c"))
    h_new = o * torch.tanh(c_new)
    np.testing.assert_allclose(np.asarray(h_ours), h_new.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ours), c_new.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# LRGCN
# ---------------------------------------------------------------------------


def test_lrgcn_matches_torch(setup, rng):
    g, a, x = setup
    R = 3
    e = g.num_edges
    s_np = np.asarray(g.senders)[:e]
    r_np = np.asarray(g.receivers)[:e]
    etype = rng.integers(0, R, size=e)
    rel_graphs = split_relations(np.stack([s_np, r_np]), etype, R, N)
    rng2 = np.random.default_rng(3)
    h = rng2.normal(size=(N, C)).astype(np.float32)
    c = rng2.normal(size=(N, C)).astype(np.float32)
    m = LRGCN(out_channels=C, num_relations=R)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), rel_graphs)
    h_ours, c_ours = m.apply(
        params, jnp.asarray(x), rel_graphs, jnp.asarray(h), jnp.asarray(c)
    )

    # torch RGCN (mean aggregation, per-relation weight + root + bias)
    mats = []
    for r_ in range(R):
        mm = torch.zeros(N, N, dtype=torch.float64)
        mask = etype == r_
        for s_i, r_i in zip(s_np[mask], r_np[mask]):
            mm[r_i, s_i] += 1.0
        deg = mm.sum(1)
        inv = torch.where(deg > 0, 1.0 / deg.clamp(min=1), torch.zeros_like(deg))
        mats.append(inv[:, None] * mm)

    p = params["params"]

    def rgcn(conv, v):
        w = t64(p[conv]["weight"])
        out = sum(mats[r_] @ v @ w[r_] for r_ in range(R))
        return out + v @ t64(p[conv]["root"]) + t64(p[conv]["bias"])

    xt, ht, ct = t64(x), t64(h), t64(c)

    def pair(name):
        return rgcn(f"conv_x_{name}", xt) + rgcn(f"conv_h_{name}", ht)

    i, f, o = sig(pair("i")), sig(pair("f")), sig(pair("o"))
    c_new = f * ct + i * torch.tanh(pair("c"))
    h_new = o * torch.tanh(c_new)
    np.testing.assert_allclose(np.asarray(h_ours), h_new.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ours), c_new.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# EvolveGCN-O / EvolveGCN-H
# ---------------------------------------------------------------------------


def test_evolvegcno_matches_torch(setup):
    g, a, x = setup
    xs = x[:, :C] if F >= C else np.pad(x, ((0, 0), (0, C - F)))
    xs = np.ascontiguousarray(xs[:, :C], dtype=np.float32)
    m = EvolveGCNO(in_channels=C)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(xs), g)
    out1, w1 = m.apply(params, jnp.asarray(xs), g, None)
    out2, w2 = m.apply(params, jnp.asarray(xs), g, w1)

    p = params["params"]
    gru = p["recurrent"]["cell"]
    w0 = t64(p["initial_weight"])
    norm = torch_gcn_norm(a)
    xt = t64(xs)

    w1_t = flax_gru(gru, w0, w0)
    want1 = norm @ (xt @ w1_t)
    w2_t = flax_gru(gru, w1_t, w1_t)
    want2 = norm @ (xt @ w2_t)
    np.testing.assert_allclose(np.asarray(out1), want1.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), w1_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), want2.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w2), w2_t.numpy(), atol=1e-4)


def test_evolvegcnh_matches_torch(setup):
    g, a, x = setup
    m = EvolveGCNH(num_of_nodes=N, in_channels=F)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    out, w_new = m.apply(params, jnp.asarray(x), g, None)

    p = params["params"]
    xt = t64(x)
    pvec = t64(p["pool_score"])[:, 0]
    s = xt @ pvec / pvec.norm().clamp(min=1e-16)
    k = int(np.ceil(F / N * N))  # ratio = F/N -> k = F
    vals, idx = torch.topk(s, k)
    x_tilde = xt[idx] * torch.tanh(vals)[:, None]
    w0 = t64(p["initial_weight"])
    w_t = flax_gru(p["recurrent"]["cell"], w0, x_tilde)
    want = torch_gcn_norm(a) @ (xt @ w_t)
    np.testing.assert_allclose(np.asarray(w_new), w_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# DCRNN compat='reference' — the reference's exact algorithm
# ---------------------------------------------------------------------------


def torch_reference_dconv_basis(ei, w, x, k):
    """Independent torch implementation of the reference DConv propagation
    (``/root/reference/torch_geometric_temporal/nn/recurrent/dcrnn.py:59-106``):
    unweighted messages with weighted-degree norms, reverse edge list from
    the sorted dense transpose with norms in ORIGINAL edge order, and the
    Chebyshev two-back term frozen at X."""
    n = x.shape[0]
    adj = torch.zeros(n, n, dtype=torch.float64)
    adj[torch.as_tensor(ei[0]), torch.as_tensor(ei[1])] = torch.as_tensor(
        np.asarray(w, dtype=np.float64)
    )
    deg_out = adj.sum(1)
    deg_in = adj.sum(0)
    row = torch.as_tensor(ei[0], dtype=torch.long)
    col = torch.as_tensor(ei[1], dtype=torch.long)
    norm_out = (1.0 / deg_out)[row]
    norm_in = (1.0 / deg_in)[row]  # reference quirk: indexed by senders
    # dense_to_sparse(adj^T): nonzero() walks row-major over adj^T
    rev = adj.t().nonzero(as_tuple=False)  # (E, 2) rows sorted (r, s)
    rev_row, rev_col = rev[:, 0], rev[:, 1]

    def prop(rows_, cols_, norm, v):
        out = torch.zeros(n, v.shape[1], dtype=torch.float64)
        out.index_add_(0, cols_, norm[:, None] * v[rows_])
        return out

    xt = t64(x)
    basis = []
    for rows_, cols_, norm in (
        (row, col, norm_out),
        (rev_row, rev_col, norm_in),
    ):
        tx = [xt]
        if k > 1:
            tx.append(prop(rows_, cols_, norm, xt))
        for _ in range(2, k):
            tx.append(2.0 * prop(rows_, cols_, norm, tx[-1]) - xt)
        basis.extend(tx)
    return torch.cat(basis, dim=-1)


def test_dcrnn_reference_compat_matches_reference_algorithm(setup):
    g, a, x = setup
    e = g.num_edges
    ei = np.stack([np.asarray(g.senders)[:e], np.asarray(g.receivers)[:e]])
    w = np.asarray(g.weights)[:e]
    rng2 = np.random.default_rng(4)
    h = rng2.normal(size=(N, C)).astype(np.float32)
    m = DCRNN(out_channels=C, K=K, compat="reference")
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g, jnp.asarray(h)))

    p = params["params"]
    xh = np.concatenate([x, h], axis=-1)
    zr = sig(
        torch_reference_dconv_basis(ei, w, xh, K) @ t64(p["w_zr"])
        + t64(p["b_zr"])
    )
    z, r = zr.chunk(2, dim=-1)
    ht = t64(h)
    xhr = torch.cat([t64(x), ht * r], dim=-1).numpy()
    htil = torch.tanh(
        torch_reference_dconv_basis(ei, w, xhr, K) @ t64(p["w_h"])
        + t64(p["b_h"])
    )
    want = (z * ht + (1 - z) * htil).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# A3TGCN / AGCRN
# ---------------------------------------------------------------------------


def torch_tgcn(p, a, x, h):
    """Torch mirror of our TGCN cell (same math as test_golden_torch)."""
    norm = torch_gcn_norm(a)

    def conv(name, v):
        return norm @ (v @ t64(p[name]["weight"])) + t64(p[name]["bias"])

    def dense(name, v):
        return v @ t64(p[name]["kernel"]) + t64(p[name]["bias"])

    ht = h if isinstance(h, torch.Tensor) else t64(h)
    xt = x if isinstance(x, torch.Tensor) else t64(x)
    z = sig(dense("linear_z", torch.cat([conv("conv_z", xt), ht], -1)))
    r = sig(dense("linear_r", torch.cat([conv("conv_r", xt), ht], -1)))
    htil = torch.tanh(
        dense("linear_h", torch.cat([conv("conv_h", xt), ht * r], -1))
    )
    return z * ht + (1 - z) * htil


def test_a3tgcn_matches_torch(setup):
    g, a, x = setup
    T = 4
    rng2 = np.random.default_rng(5)
    xt = rng2.normal(size=(N, F, T)).astype(np.float32)
    h = rng2.normal(size=(N, C)).astype(np.float32)
    m = A3TGCN(out_channels=C, periods=T)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(xt), g)
    ours = np.asarray(m.apply(params, jnp.asarray(xt), g, jnp.asarray(h)))

    p = params["params"]
    probs = torch.softmax(t64(p["attention"]), dim=0)
    acc = torch.zeros(N, C, dtype=torch.float64)
    for t_ in range(T):
        acc = acc + probs[t_] * torch_tgcn(
            p["base_tgcn"], a, t64(xt[:, :, t_]), t64(h)
        )
    np.testing.assert_allclose(ours, acc.numpy(), atol=1e-4)


def test_agcrn_matches_torch(rng):
    B, n, f, c, k, d = 2, 9, 4, 6, 3, 5
    x = rng.normal(size=(B, n, f)).astype(np.float32)
    e = rng.normal(size=(n, d)).astype(np.float32)
    h = rng.normal(size=(B, n, c)).astype(np.float32)
    m = AGCRN(number_of_nodes=n, out_channels=c, K=k, embedding_dimensions=d)
    params = m.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(e), jnp.asarray(h)
    )
    ours = np.asarray(
        m.apply(params, jnp.asarray(x), jnp.asarray(e), jnp.asarray(h))
    )

    p = params["params"]
    et = t64(e)
    supports = torch.softmax(torch.relu(et @ et.t()), dim=1)
    sup = [torch.eye(n, dtype=torch.float64), supports]
    for _ in range(2, k):
        sup.append(2.0 * supports @ sup[-1] - sup[-2])
    sup = torch.stack(sup)  # (K, N, N)

    def avwgcn(name, v):
        wp = t64(p[name]["weights_pool"])  # (D, K, in, out)
        bp = t64(p[name]["bias_pool"])     # (D, out)
        weights = torch.einsum("nd,dkio->nkio", et, wp)
        bias = et @ bp
        x_g = torch.einsum("knm,bmi->bnki", sup, v)
        return torch.einsum("bnki,nkio->bno", x_g, weights) + bias

    xt, ht = t64(x), t64(h)
    zr = sig(avwgcn("gate", torch.cat([xt, ht], -1)))
    z, r = zr.chunk(2, dim=-1)
    hc = torch.tanh(avwgcn("update", torch.cat([xt, z * ht], -1)))
    want = (r * ht + (1 - r) * hc).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# DyGrEncoder / MPNNLSTM
# ---------------------------------------------------------------------------


def test_dygrencoder_matches_torch(setup):
    g, a, x = setup
    L, CC = 2, C
    m = DyGrEncoder(
        conv_out_channels=CC, conv_num_layers=2, conv_aggr="add",
        lstm_out_channels=CC, lstm_num_layers=L,
    )
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ht_ours, h_ours, c_ours = m.apply(params, jnp.asarray(x), g)

    p = params["params"]
    conv = p["conv_layer"]
    at = t64(a.T)  # aggregation matrix: out[r] = sum_s w(s->r) m[s]
    hh = torch.cat(
        [t64(x), torch.zeros(N, CC - F, dtype=torch.float64)], dim=-1
    )
    w = t64(conv["weight"])
    for layer in range(2):
        msg = at @ (hh @ w[layer])
        hh = flax_gru(conv["gru"], hh, msg)
    # LSTM stack over a single step; the returned "H_tilde" is the LSTM
    # top-layer output (reference dygrae.py:51-88 returns the lstm output,
    # not the conv output)
    inp = hh
    hs, cs = [], []
    for layer in range(L):
        c0 = torch.zeros(N, CC, dtype=torch.float64)
        h0 = torch.zeros(N, CC, dtype=torch.float64)
        c_new, h_new = flax_lstm(p[f"lstm_{layer}"], c0, h0, inp)
        inp = h_new
        hs.append(h_new)
        cs.append(c_new)
    np.testing.assert_allclose(np.asarray(ht_ours), inp.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_ours), torch.stack(hs).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ours), torch.stack(cs).numpy(), atol=1e-4)


def test_mpnnlstm_matches_torch(rng):
    n, w, f, nhid = 6, 3, 4, 5
    nw = n * w
    ring = np.stack([np.arange(nw), (np.arange(nw) + 1) % nw])
    ei = np.unique(
        np.concatenate([ring, rng.integers(0, nw, size=(2, 40))], axis=1),
        axis=1,
    )
    wts = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float64)
    a = np.zeros((nw, nw))
    a[ei[0], ei[1]] = wts
    g = Graph.from_edge_index(ei, wts, num_nodes=nw)
    x = rng.normal(size=(nw, f)).astype(np.float32)

    m = MPNNLSTM(hidden_size=nhid, num_nodes=n, window=w, dropout=0.5)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(variables, jnp.asarray(x), g, False))

    p = variables["params"]
    norm = torch_gcn_norm(a)
    xt = t64(x)

    def bn(name, v):
        # eval mode: running stats are the init values (mean 0, var 1)
        scale = t64(p[name]["scale"])
        bias = t64(p[name]["bias"])
        return v / np.sqrt(1.0 + 1e-5) * scale + bias

    def gconv(name, v):
        cv = norm @ (v @ t64(p[f"conv_{name}"]["weight"])) + t64(
            p[f"conv_{name}"]["bias"]
        )
        return bn(f"bn_{name}", torch.relu(cv))

    h1 = gconv("1", xt)
    h2 = gconv("2", h1)
    hcat = torch.cat([h1, h2], dim=-1)  # (w*n, 2*nhid)

    s = xt.reshape(-1, w, n, f).swapaxes(1, 2).reshape(-1, w, f)
    s = torch.cat([s[:, 0, :]] + [s[:, l, f - 1 : f] for l in range(1, w)], dim=1)

    seq = hcat.reshape(-1, w, n, 2 * nhid).swapaxes(0, 1).reshape(w, -1, 2 * nhid)

    def run_lstm(name, inputs, feats):
        bsz = inputs.shape[1]
        c0 = torch.zeros(bsz, feats, dtype=torch.float64)
        h0 = torch.zeros(bsz, feats, dtype=torch.float64)
        outs = []
        for t_ in range(inputs.shape[0]):
            c0, h0 = flax_lstm(p[name], c0, h0, inputs[t_])
            outs.append(h0)
        return torch.stack(outs), h0

    seq1, h_1 = run_lstm("lstm_1", seq, nhid)
    _, h_2 = run_lstm("lstm_2", seq1, nhid)
    want = torch.cat([h_1, h_2, s], dim=1).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# HeteroGCLSTM
# ---------------------------------------------------------------------------


def test_heterogclstm_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models import HeteroGCLSTM

    na, nb, fa, fb, c = 6, 5, 4, 3, 7
    x_dict = {
        "a": jnp.asarray(rng.normal(size=(na, fa)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(nb, fb)).astype(np.float32)),
    }
    metadata = (["a", "b"], [("a", "to", "b"), ("b", "to", "a"),
                             ("a", "self", "a")])
    ei_ab = np.stack([rng.integers(0, na, 12), rng.integers(0, nb, 12)])
    ei_ba = np.stack([rng.integers(0, nb, 10), rng.integers(0, na, 10)])
    ei_aa = np.stack([rng.integers(0, na, 8), rng.integers(0, na, 8)])
    graphs = {
        ("a", "to", "b"): Graph.from_edge_index(ei_ab, num_nodes=nb, num_src=na),
        ("b", "to", "a"): Graph.from_edge_index(ei_ba, num_nodes=na, num_src=nb),
        ("a", "self", "a"): Graph.from_edge_index(ei_aa, num_nodes=na),
    }
    m = HeteroGCLSTM(
        in_channels_dict={"a": fa, "b": fb}, out_channels=c, metadata=metadata
    )
    h_dict = {
        "a": jnp.asarray(rng.normal(size=(na, c)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(nb, c)).astype(np.float32)),
    }
    c_dict = {
        "a": jnp.asarray(rng.normal(size=(na, c)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(nb, c)).astype(np.float32)),
    }
    params = m.init(jax.random.PRNGKey(0), x_dict, graphs)
    h_ours, c_ours = m.apply(params, x_dict, graphs, h_dict, c_dict)

    p = params["params"]
    sizes = {"a": na, "b": nb}
    mean_mats = {}
    for et, ei in (("a__to__b", ei_ab), ("b__to__a", ei_ba),
                   ("a__self__a", ei_aa)):
        src, _, dst = et.split("__")
        mm = torch.zeros(sizes[dst], sizes[src], dtype=torch.float64)
        for s_i, r_i in zip(ei[0], ei[1]):
            mm[r_i, s_i] += 1.0
        deg = mm.sum(1)
        inv = torch.where(deg > 0, 1.0 / deg.clamp(min=1), torch.zeros_like(deg))
        mean_mats[et] = inv[:, None] * mm

    ht = {k: t64(v) for k, v in h_dict.items()}
    ct = {k: t64(v) for k, v in c_dict.items()}
    xt = {k: t64(v) for k, v in x_dict.items()}

    def sage(name, et, src, dst):
        conv = p[f"conv_{name}_{et}"]
        agg = mean_mats[et] @ ht[src]
        out = agg @ t64(conv["lin_l"]["kernel"]) + t64(conv["lin_l"]["bias"])
        return out + ht[dst] @ t64(conv["lin_r"]["kernel"])

    def hetero_conv(gate):
        out = {"a": torch.zeros(na, c, dtype=torch.float64),
               "b": torch.zeros(nb, c, dtype=torch.float64)}
        out["b"] = out["b"] + sage(gate, "a__to__b", "a", "b")
        out["a"] = out["a"] + sage(gate, "b__to__a", "b", "a")
        out["a"] = out["a"] + sage(gate, "a__self__a", "a", "a")
        return out

    def gate(name, act):
        conv = hetero_conv(name)
        return {
            nt: act(xt[nt] @ t64(p[f"W_{name}_{nt}"]) + conv[nt]
                    + t64(p[f"b_{name}_{nt}"]))
            for nt in ("a", "b")
        }

    i = gate("i", sig)
    f_ = gate("f", sig)
    t_ = gate("c", torch.tanh)
    c_new = {nt: f_[nt] * ct[nt] + i[nt] * t_[nt] for nt in ("a", "b")}
    o = gate("o", sig)
    h_new = {nt: o[nt] * torch.tanh(c_new[nt]) for nt in ("a", "b")}
    for nt in ("a", "b"):
        np.testing.assert_allclose(
            np.asarray(h_ours[nt]), h_new[nt].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(c_ours[nt]), c_new[nt].numpy(), atol=1e-4
        )


def test_dcrnn_compat_differs_from_paper_mode_on_weighted_graphs(setup):
    """The compat mode must actually change the numerics on a weighted graph
    (otherwise it proves nothing)."""
    g, a, x = setup
    m_ref = DCRNN(out_channels=C, K=K, compat="reference")
    m_paper = DCRNN(out_channels=C, K=K)
    params = m_ref.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    out_ref = np.asarray(m_ref.apply(params, jnp.asarray(x), g))
    out_paper = np.asarray(m_paper.apply(params, jnp.asarray(x), g))
    assert not np.allclose(out_ref, out_paper, atol=1e-3)
