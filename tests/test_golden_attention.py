"""Golden numerical cross-checks for the attention model family.

Independent dense torch (float64) oracles for STConv, ASTGCN, MSTGCN, GMAN,
AAGCN, DNNTSP and MTGNN, loaded with OUR initialized parameters.  Oracles
favor explicit loops / torch.nn.functional convs over copying our einsum
formulations, so a transposed axis or swapped gate in either side fails.
All norms run in eval mode (running stats at their init values).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

from pytorch_geometric_temporal_tpu.ops import Graph  # noqa: E402


def t64(a):
    return torch.as_tensor(np.asarray(a), dtype=torch.float64)


def sig(a):
    return torch.sigmoid(a)


def conv_last(p, x, stride=(1, 1), pad=((0, 0), (0, 0)), dil=(1, 1)):
    """flax nn.Conv mirror for channel-last (B, A1, A2, Cin) inputs."""
    w = t64(p["kernel"])  # (k1, k2, Cin, Cout)
    xt = x.permute(0, 3, 1, 2)  # (B, Cin, A1, A2)
    xt = tF.pad(xt, (pad[1][0], pad[1][1], pad[0][0], pad[0][1]))
    out = tF.conv2d(xt, w.permute(3, 2, 0, 1), stride=stride, dilation=dil)
    out = out.permute(0, 2, 3, 1)
    if "bias" in p:
        out = out + t64(p["bias"])
    return out


def dense(p, x):
    out = x @ t64(p["kernel"])
    if "bias" in p:
        out = out + t64(p["bias"])
    return out


def bn_eval(p, x, axis=-1):
    """flax BatchNorm in eval mode with init running stats (mean 0, var 1)."""
    scale, bias = t64(p["scale"]), t64(p["bias"])
    shape = [1] * x.ndim
    shape[axis] = -1
    return x / np.sqrt(1.0 + 1e-5) * scale.reshape(shape) + bias.reshape(shape)


def layernorm(p, x):
    """flax LayerNorm mirror (last axis, eps 1e-6)."""
    mean = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mean) / torch.sqrt(var + 1e-6) * t64(p["scale"]) + t64(p["bias"])


@pytest.fixture
def sym_graph(rng):
    n = 9
    ei = rng.integers(0, n, size=(2, 30))
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    ei = np.concatenate([ei, ring], axis=1)
    both = np.concatenate([ei, ei[::-1]], axis=1)
    both = np.unique(both, axis=1)
    keep = both[0] != both[1]
    both = both[:, keep]
    w = np.ones(both.shape[1])
    # symmetrize weights by construction (unit weights)
    a = np.zeros((n, n))
    a[both[0], both[1]] = w
    g = Graph.from_edge_index(both, w, num_nodes=n)
    return g, a, n


# ---------------------------------------------------------------------------
# STConv
# ---------------------------------------------------------------------------


def torch_cheb_hops(lhat, x, k):
    """[T_0 x, ..., T_{K-1} x] with dense lhat acting out = lhat @ x."""
    xs = [x]
    if k > 1:
        xs.append(torch.einsum("ij,...jf->...if", lhat, x))
    for _ in range(2, k):
        xs.append(2 * torch.einsum("ij,...jf->...if", lhat, xs[-1]) - xs[-2])
    return torch.cat(xs, dim=-1)


def test_stconv_matches_torch(sym_graph, rng):
    from pytorch_geometric_temporal_tpu.models.attention import STConv

    g, a, n = sym_graph
    B, T, F_, H, C, ks, K = 2, 6, 3, 5, 4, 2, 3
    x = rng.normal(size=(B, T, n, F_)).astype(np.float32)
    m = STConv(num_nodes=n, hidden_channels=H, out_channels=C,
               kernel_size=ks, K=K)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(variables, jnp.asarray(x), g))

    p = variables["params"]

    def temporal_conv(name, v):
        # v: (B, T, N, C) -> swap to (B, N, T, C), conv (1, ks) over T
        vt = v.permute(0, 2, 1, 3)
        pp = p[name]
        a_ = conv_last(pp["conv_1"], vt)
        b_ = sig(conv_last(pp["conv_2"], vt))
        c_ = conv_last(pp["conv_3"], vt)
        return torch.relu(a_ * b_ + c_).permute(0, 2, 1, 3)

    xt = t64(x)
    t0 = temporal_conv("temporal_conv1", xt)
    # ChebConv sym lambda=2: lhat = -D^-1/2 A D^-1/2 (source-side degrees)
    deg = t64(a).sum(1)
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    lhat = -(dis[:, None] * t64(a) * dis[None, :])
    z = torch_cheb_hops(lhat, t0, K)
    gc = z @ t64(p["graph_conv"]["weight"]) + t64(p["graph_conv"]["bias"])
    t1 = temporal_conv("temporal_conv2", torch.relu(gc))
    want = bn_eval(p["batch_norm"], t1, axis=2).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# ASTGCN (sym normalization) / MSTGCN (None normalization)
# ---------------------------------------------------------------------------


def _astgcn_lhat_sym(a):
    an = t64(a).clone()
    an.fill_diagonal_(0.0)
    deg = an.sum(1)
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    return -(dis[:, None] * an * dis[None, :])


def test_astgcn_matches_torch(sym_graph, rng):
    from pytorch_geometric_temporal_tpu.models.attention import ASTGCN

    g, a, n = sym_graph
    B, F_, T, K = 2, 2, 4, 3
    nb_time, nb_chev, t_strides, n_pred = 4, 5, 2, 3
    x = rng.normal(size=(B, n, F_, T)).astype(np.float32)
    m = ASTGCN(nb_block=2, in_channels=F_, K=K, nb_chev_filter=nb_chev,
               nb_time_filter=nb_time, time_strides=t_strides,
               num_for_predict=n_pred, len_input=T, num_of_vertices=n,
               normalization="sym")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(variables, jnp.asarray(x), g))

    lhat = _astgcn_lhat_sym(a)

    def spatial_attention(p, v):
        # v: (B, N, F, T)
        lhs = torch.einsum("bnft,t->bnf", v, t64(p["W1"]))
        lhs = lhs @ t64(p["W2"])  # (B, N, T)
        rhs = torch.einsum("f,bnft->btn", t64(p["W3"]), v)
        s = torch.einsum("ij,bjn->bin",
                         t64(p["Vs"]), sig(torch.bmm(lhs, rhs) + t64(p["bs"])))
        return torch.softmax(s, dim=1)

    def temporal_attention(p, v):
        lhs = torch.einsum("bnft,n->btf", v, t64(p["U1"]))
        lhs = lhs @ t64(p["U2"])  # (B, T, N)
        rhs = torch.einsum("f,bnft->bnt", t64(p["U3"]), v)
        e = torch.einsum("ij,bjt->bit",
                         t64(p["Ve"]), sig(torch.bmm(lhs, rhs) + t64(p["be"])))
        return torch.softmax(e, dim=1)

    def cheb_attention(p, v, s, k):
        # v: (B, T, N, F); s: (B, N, N)
        w = t64(p["weight"])  # (K, F, C)
        s_diag = torch.diagonal(s, dim1=1, dim2=2)  # (B, N)
        tax0 = v * s_diag[:, None, :, None]
        out = tax0 @ w[0]
        if k > 1:
            hop1 = torch.einsum("ij,bij,btjf->btif", lhat, s, tax0)
            tax1 = hop1
            out = out + tax1 @ w[1]
            prev0 = tax0
            for kk in range(2, k):
                tax2 = 2.0 * torch.einsum("ij,btjf->btif", lhat, tax1) - prev0
                out = out + tax2 @ w[kk]
                prev0, tax1 = tax1, tax2
        return out + t64(p["bias"])

    def block(p, v, strides, t_in):
        e = temporal_attention(p["temporal_attention"], v)
        x_tilde = torch.einsum("bnft,bts->bnfs", v, e)
        s = spatial_attention(p["spatial_attention"], x_tilde)
        vt = v.permute(0, 3, 1, 2)  # (B, T, N, F)
        x_hat = torch.relu(cheb_attention(p["chebconv_attention"], vt, s, K))
        x_hat = x_hat.permute(0, 2, 1, 3)  # (B, N, T, C)
        x_hat = conv_last(p["time_convolution"], x_hat,
                          stride=(1, strides), pad=((0, 0), (1, 1)))
        res = conv_last(p["residual_convolution"], v.permute(0, 1, 3, 2),
                        stride=(1, strides))
        out = layernorm(p["layer_norm"], torch.relu(res + x_hat))
        return out.permute(0, 1, 3, 2)  # (B, N, C, T')

    p = variables["params"]
    v = t64(x)
    v = block(p["block_0"], v, t_strides, T)
    v = block(p["block_1"], v, 1, T // t_strides)
    want = (torch.einsum("bnft,ptf->bnp", v, t64(p["final_conv_w"]))
            + t64(p["final_conv_b"])).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_mstgcn_matches_torch(sym_graph, rng):
    from pytorch_geometric_temporal_tpu.models.attention import MSTGCN

    g, a, n = sym_graph
    B, F_, T, K = 2, 2, 4, 3
    m = MSTGCN(nb_block=2, in_channels=F_, K=K, nb_chev_filter=5,
               nb_time_filter=4, time_strides=2, num_for_predict=3,
               len_input=T)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(
        rng.normal(size=(B, n, F_, T)).astype(np.float32)), g)
    x = rng.normal(size=(B, n, F_, T)).astype(np.float32)
    ours = np.asarray(m.apply(variables, jnp.asarray(x), g))

    # normalization=None: lhat = (2/lambda_max) (D_out - A)^T_action - I
    at = t64(a)
    ldense = torch.diag(at.sum(1)) - at.t()  # action out[r] = deg r? see note
    # our laplacian(None): diag = out_degree, off = -w on (s->r); action of
    # spmm: out[r] = sum_s L[(s->r)] x[s] -> dense [r, s] = diag(deg_out) - A^T
    lam = float(np.max(np.real(np.linalg.eigvals(ldense.numpy()))))
    lhat = (2.0 / lam) * ldense - torch.eye(n, dtype=torch.float64)

    p = variables["params"]

    def block(p, v, strides):
        vt = v.permute(0, 3, 1, 2)  # (B, T, N, F)
        z = torch_cheb_hops(lhat, vt, K)
        gc = z @ t64(p["cheb_conv"]["weight"]) + t64(p["cheb_conv"]["bias"])
        x_tilde = torch.relu(gc).permute(0, 2, 1, 3)  # (B, N, T, C)
        x_tilde = conv_last(p["time_conv"], x_tilde, stride=(1, strides),
                            pad=((0, 0), (1, 1)))
        res = conv_last(p["residual_conv"], v.permute(0, 1, 3, 2),
                        stride=(1, strides))
        out = layernorm(p["layer_norm"], torch.relu(res + x_tilde))
        return out.permute(0, 1, 3, 2)

    v = t64(x)
    v = block(p["block_0"], v, 2)
    v = block(p["block_1"], v, 1)
    want = (torch.einsum("bnft,ptf->bnp", v, t64(p["final_conv_w"]))
            + t64(p["final_conv_b"])).numpy()
    # power iteration approximates lambda_max -> slightly looser tolerance
    np.testing.assert_allclose(ours, want, atol=5e-3)


# ---------------------------------------------------------------------------
# GMAN
# ---------------------------------------------------------------------------


def test_gman_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import GMAN

    L, K, d = 1, 2, 3
    D = K * d
    B, n, his, pred, spd = 2, 5, 3, 2, 8
    x = rng.normal(size=(B, his, n)).astype(np.float32)
    se = rng.normal(size=(n, D)).astype(np.float32)
    te = rng.integers(0, 7, size=(B, his + pred, 2)).astype(np.int32)
    te[..., 1] %= spd
    m = GMAN(L=L, K=K, d=d, num_his=his, bn_decay=0.1, steps_per_day=spd)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(se), jnp.asarray(te))
    ours = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(se),
                              jnp.asarray(te)))

    p = variables["params"]

    def fc(pf, v, acts):
        for i, act in enumerate(acts):
            v = dense(pf[f"dense_{i}"], v)
            v = bn_eval(pf[f"bn_{i}"], v)
            if act is not None:
                v = act(v)
        return v

    def heads(v):
        *lead, DD = v.shape
        return v.reshape(*lead, DD // K, K)

    def spatial_att(pa, v, ste):
        xs = torch.cat([v, ste], dim=-1)
        q = heads(fc(pa["fc_q"], xs, [torch.relu]))
        k = heads(fc(pa["fc_k"], xs, [torch.relu]))
        vv = heads(fc(pa["fc_v"], xs, [torch.relu]))
        att = torch.einsum("btnhk,btmhk->bthnm", q, k) / np.sqrt(d)
        att = torch.softmax(att, dim=-1)
        out = torch.einsum("bthnm,btmhk->btnhk", att, vv)
        out = out.reshape(*out.shape[:-2], D)
        return fc(pa["fc_out"], out, [torch.relu])

    def temporal_att(pa, v, ste):
        T = v.shape[1]
        xs = torch.cat([v, ste], dim=-1)
        q = heads(fc(pa["fc_q"], xs, [torch.relu]))
        k = heads(fc(pa["fc_k"], xs, [torch.relu]))
        vv = heads(fc(pa["fc_v"], xs, [torch.relu]))
        att = torch.einsum("btnhk,bsnhk->bhnts", q, k) / np.sqrt(d)
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        att = torch.where(causal, att, torch.tensor(-(2.0 ** 15) + 1,
                                                    dtype=torch.float64))
        att = torch.softmax(att, dim=-1)
        out = torch.einsum("bhnts,bsnhk->btnhk", att, vv)
        out = out.reshape(*out.shape[:-2], D)
        return fc(pa["fc_out"], out, [torch.relu])

    def st_att(pa, v, ste):
        hs = spatial_att(pa["spatial"], v, ste)
        ht = temporal_att(pa["temporal"], v, ste)
        xs_ = fc(pa["fusion"]["fc_xs"], hs, [None])
        xt_ = fc(pa["fusion"]["fc_xt"], ht, [None])
        z = sig(xs_ + xt_)
        h = z * hs + (1 - z) * ht
        return v + fc(pa["fusion"]["fc_h"], h, [torch.relu, None])

    xt = t64(x)[..., None]
    xt = fc(p["fc_in"], xt, [torch.relu, None])
    ste_p = p["st_embedding"]
    se_t = fc(ste_p["fc_se"], t64(se)[None, None], [torch.relu, None])
    dow = tF.one_hot(torch.as_tensor(te[..., 0]).long() % 7, 7).double()
    tod = tF.one_hot(torch.as_tensor(te[..., 1]).long() % spd, spd).double()
    te_t = torch.cat([dow, tod], dim=-1)[:, :, None, :]
    te_t = fc(ste_p["fc_te"], te_t, [torch.relu, None])
    ste = se_t + te_t
    ste_his, ste_pred = ste[:, :his], ste[:, his:]

    xt = st_att(p["enc_0"], xt, ste_his)
    # transform attention
    pa = p["transform"]
    q = heads(fc(pa["fc_q"], ste_pred, [torch.relu]))
    k = heads(fc(pa["fc_k"], ste_his, [torch.relu]))
    vv = heads(fc(pa["fc_v"], xt, [torch.relu]))
    att = torch.softmax(
        torch.einsum("bpnhk,bsnhk->bhnps", q, k) / np.sqrt(d), dim=-1
    )
    out = torch.einsum("bhnps,bsnhk->bpnhk", att, vv)
    xt = fc(pa["fc_out"], out.reshape(*out.shape[:-2], D), [torch.relu])
    xt = st_att(p["dec_0"], xt, ste_pred)
    want = fc(p["fc_out"], xt, [torch.relu, None])[..., 0].numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# AAGCN
# ---------------------------------------------------------------------------


def test_aagcn_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import AAGCN

    B, Cin, Cout, T, V = 2, 3, 8, 6, 7
    ei = np.unique(rng.integers(0, V, size=(2, 18)), axis=1)
    x = rng.normal(size=(B, Cin, T, V)).astype(np.float32)
    m = AAGCN(in_channels=Cin, out_channels=Cout,
              edge_index=tuple(map(tuple, ei)), num_nodes=V)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    # (3, V, V) stack: [I, col-norm A, col-norm A^T]
    a0 = np.zeros((V, V))
    a0[ei[0], ei[1]] = 1.0

    def col_norm(mm):
        s = mm.sum(0, keepdims=True)
        return mm / np.where(s == 0, 1.0, s)

    astack = torch.stack([torch.eye(V, dtype=torch.float64),
                          t64(col_norm(a0)), t64(col_norm(a0.T))])

    p = variables["params"]
    gp = p["gcn1"]
    xt = t64(x).permute(0, 2, 3, 1)  # (B, T, V, C)
    inter_c = Cout // 4
    y = torch.zeros(B, T, V, Cout, dtype=torch.float64)
    pa = t64(gp["PA"])
    alpha = t64(gp["alpha"])
    for i in range(3):
        a1 = dense(gp[f"conv_a_{i}"], xt)  # (B, T, V, ic)
        a2 = dense(gp[f"conv_b_{i}"], xt)
        a1 = a1.permute(0, 2, 1, 3).reshape(B, V, T * inter_c)
        a2 = a2.permute(0, 1, 3, 2).reshape(B, T * inter_c, V)
        aff = torch.tanh(torch.bmm(a1, a2) / (T * inter_c))
        a_eff = pa[i][None] + aff * alpha
        z = torch.einsum("btwc,bwv->btvc", xt, a_eff)
        y = y + dense(gp[f"conv_d_{i}"], z)
    y = bn_eval(gp["bn"], y)
    down = bn_eval(gp["down_bn"], dense(gp["down_conv"], xt))
    y = torch.relu(y + down)

    # STC attention
    ker_jpt = V - 1 if V % 2 == 0 else V
    pad_j = (ker_jpt - 1) // 2
    se = y.mean(dim=1)  # (B, V, C)
    w_sa = t64(gp["conv_sa"]["kernel"])  # (k, Cin, 1)
    se1 = sig(tF.conv1d(tF.pad(se.permute(0, 2, 1), (pad_j, pad_j)),
                        w_sa.permute(2, 1, 0)).permute(0, 2, 1)
              + t64(gp["conv_sa"]["bias"]))
    y = y * se1[:, None] + y
    se = y.mean(dim=2)  # (B, T, C)
    w_ta = t64(gp["conv_ta"]["kernel"])
    se1 = sig(tF.conv1d(tF.pad(se.permute(0, 2, 1), (4, 4)),
                        w_ta.permute(2, 1, 0)).permute(0, 2, 1)
              + t64(gp["conv_ta"]["bias"]))
    y = y * se1[:, :, None] + y
    se = y.mean(dim=(1, 2))
    se1 = torch.relu(dense(gp["fc1c"], se))
    se2 = sig(dense(gp["fc2c"], se1))
    y = y * se2[:, None, None] + y

    # tcn1: (9,1) conv over T + BN
    tp = p["tcn1"]
    out = conv_last(tp["conv"], y, pad=((4, 4), (0, 0)))
    out = bn_eval(tp["bn"], out)
    # residual: in != out channels -> UnitTCN kernel 1
    rp = p["residual_tcn"]
    res = bn_eval(rp["bn"], conv_last(rp["conv"], xt))
    want = torch.relu(out + res).permute(0, 3, 1, 2).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# DNNTSP
# ---------------------------------------------------------------------------


def test_dnntsp_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import DNNTSP

    items, dim, heads, T = 6, 4, 2, 3
    n = T * items  # graph over T*items nodes (reference batches graphs)
    ei = np.unique(rng.integers(0, n, size=(2, 50)), axis=1)
    w = rng.uniform(0.5, 2.0, ei.shape[1])
    a = np.zeros((n, n))
    a[ei[0], ei[1]] = w
    g = Graph.from_edge_index(ei, w, num_nodes=n)
    x = rng.normal(size=(n, dim)).astype(np.float32)

    m = DNNTSP(items_total=items, item_embedding_dim=dim, n_heads=heads)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(variables, jnp.asarray(x), g))

    p = variables["params"]
    at = t64(a.T) + torch.eye(n, dtype=torch.float64)
    deg = at.sum(1)
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    norm = dis[:, None] * at * dis[None, :]

    h = t64(x)
    for i in range(2):
        gc = p["stacked_gcn"][f"gcn_{i}"]
        h = norm @ (h @ t64(gc["weight"])) + t64(gc["bias"])
        h = torch.relu(bn_eval(p["stacked_gcn"][f"bn_{i}"], h))
    h = h.reshape(T, items, dim)  # (B=T, L=items, F)

    ma = p["masked_self_attention"]
    d_ = dim
    q = (h @ t64(ma["Wq"]["kernel"])).reshape(T, items, heads, d_)
    k = (h @ t64(ma["Wk"]["kernel"])).reshape(T, items, heads, d_)
    v = (h @ t64(ma["Wv"]["kernel"])).reshape(T, items, heads, d_)
    att = torch.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(d_)
    causal = torch.tril(torch.ones(items, items, dtype=torch.bool))
    att = torch.where(causal, att, torch.tensor(float("-inf"),
                                                dtype=torch.float64))
    att = torch.softmax(att, dim=-1)
    h = torch.einsum("bhlm,bmhd->blhd", att, v).mean(dim=2)

    h = h @ t64(p["aggregate_Wq"]["kernel"])
    h = h.reshape(-1, items, dim)
    emb = t64(p["item_embedding"]["embedding"])
    alpha = t64(p["global_gated_updater"]["alpha"])
    want = ((1 - alpha) * emb[None] + alpha * h).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


# ---------------------------------------------------------------------------
# MTGNN
# ---------------------------------------------------------------------------


def test_mtgnn_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import MTGNN

    B, Cin, n, T = 2, 2, 7, 8
    layers, ksz = 2, 3
    m = MTGNN(
        gcn_true=True, build_adj=True, gcn_depth=2, num_nodes=n,
        kernel_set=[2, 3], kernel_size=ksz, dropout=0.0, subgraph_size=3,
        node_dim=4, dilation_exponential=1, conv_channels=4,
        residual_channels=4, skip_channels=5, end_channels=6,
        seq_length=T, in_dim=Cin, out_dim=3, layers=layers,
        propalpha=0.05, tanhalpha=3, layer_norm_affline=True,
    )
    x = rng.normal(size=(B, Cin, n, T)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    rf = layers * (ksz - 1) + 1  # dilation_exponential == 1

    # graph constructor
    gcp = p["graph_constructor"]
    idx = torch.arange(n)
    v1 = torch.tanh(3 * dense(gcp["linear1"], t64(gcp["embedding1"])))
    v2 = torch.tanh(3 * dense(gcp["linear2"], t64(gcp["embedding2"])))
    a_ = torch.relu(torch.tanh(3 * (v1 @ v2.t() - v2 @ v1.t())))
    vals, top_idx = torch.topk(a_, 3, dim=1)
    mask = torch.zeros_like(a_)
    mask.scatter_(1, top_idx, 1.0)
    a_tilde = a_ * mask

    def mixprop(pm, v, adj):
        adj = adj + torch.eye(n, dtype=torch.float64)
        adj = adj / adj.sum(1, keepdim=True)
        h = v
        out = [v]
        for _ in range(2):
            h = 0.05 * v + 0.95 * torch.einsum("vw,bwtc->bvtc", adj, h)
            out.append(h)
        return dense(pm["mlp"], torch.cat(out, dim=-1))

    def dilated_inception(pd, v, dil):
        outs = []
        for i, kern in enumerate([2, 3]):
            outs.append(conv_last(pd[f"conv_{i}"], v, dil=(1, dil)))
        t_min = outs[-1].shape[2]
        return torch.cat([o[:, :, -t_min:] for o in outs], dim=-1)

    xt = t64(x).permute(0, 2, 3, 1)  # (B, N, T, C)
    xcur = dense(p["start_conv"], xt)
    x_skip = conv_last(p["skip_conv_0"], xt)  # kernel (1, max(T, rf))

    new_dilation = 1
    for j in range(1, layers + 1):
        lp = p[f"layer_{j-1}"]
        rf_size_j = 1 + j * (ksz - 1)
        t_len = max(T, rf) - rf_size_j + 1
        x_res = xcur
        x_f = torch.tanh(dilated_inception(lp["filter_conv"], xcur,
                                           new_dilation))
        x_g = sig(dilated_inception(lp["gate_conv"], xcur, new_dilation))
        xcur = x_f * x_g
        x_skip = conv_last(lp["skip_conv"], xcur) + x_skip
        xcur = mixprop(lp["mixprop1"], xcur, a_tilde) + mixprop(
            lp["mixprop2"], xcur, a_tilde.t()
        )
        xcur = xcur + x_res[:, :, -xcur.shape[2]:]
        # node-indexed layer norm: normalize over (N, T, C) per batch
        mean = xcur.mean(dim=(1, 2, 3), keepdim=True)
        var = xcur.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        xn = (xcur - mean) / torch.sqrt(var + 1e-5)
        w_ = t64(lp["norm"]["weight"])[idx][None]
        b_ = t64(lp["norm"]["bias"])[idx][None]
        xcur = xn * w_ + b_
        assert xcur.shape[2] == t_len
        new_dilation *= 1

    x_skip = conv_last(p["skip_conv_E"], xcur) + x_skip
    out = torch.relu(x_skip)
    out = torch.relu(dense(p["end_conv_1"], out))
    out = dense(p["end_conv_2"], out)
    want = out.permute(0, 3, 1, 2).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)
