"""Golden numerical cross-checks vs independent torch implementations.

BASELINE asks for per-layer activation parity with the reference.  The
reference stack (torch_geometric) is not installable here, so these tests
re-implement the documented math in plain torch (dense linear algebra,
written independently of both the reference and our JAX code) and assert
that our layers produce the same activations when loaded with identical
parameters.  This catches transcription errors in either direction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pytorch_geometric_temporal_tpu.models import DCRNN, GConvGRU, TGCN
from pytorch_geometric_temporal_tpu.models.conv import ChebConv, GCNConv
from pytorch_geometric_temporal_tpu.ops import Graph

N, E, F, C, K = 11, 35, 5, 7, 3


@pytest.fixture
def setup(rng):
    ei = np.unique(rng.integers(0, N, size=(2, E)), axis=1)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float64)
    a = np.zeros((N, N))
    a[ei[0], ei[1]] = w  # A[s, r]
    x = rng.normal(size=(N, F)).astype(np.float32)
    g = Graph.from_edge_index(ei, w, num_nodes=N)
    return g, a, x


def torch_cheb_basis(a, x, k):
    """Independent dense torch impl of the scaled-Laplacian Chebyshev basis
    (sym norm, lambda_max=2): L_hat = -D^-1/2 A D^-1/2 acting as
    out[r] = sum_s Lhat[r,s] x[s] with source-side degrees.  Self-loops are
    dropped first (PyG ChebConv.__norm__ removes them before the
    Laplacian)."""
    a = a - np.diag(np.diag(a))
    at = torch.as_tensor(a.T)
    deg = torch.as_tensor(a.sum(1))
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    lhat = -(dis[:, None] * at * dis[None, :])
    xs = [torch.as_tensor(x, dtype=torch.float64)]
    if k > 1:
        xs.append(lhat @ xs[0])
    for _ in range(2, k):
        xs.append(2 * lhat @ xs[-1] - xs[-2])
    return torch.cat(xs, dim=-1)


def test_chebconv_matches_torch(setup):
    g, a, x = setup
    m = ChebConv(out_channels=C, K=K)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g))

    w = torch.as_tensor(np.asarray(params["params"]["weight"]), dtype=torch.float64)
    b = torch.as_tensor(np.asarray(params["params"]["bias"]), dtype=torch.float64)
    want = (torch_cheb_basis(a, x, K) @ w + b).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_gcnconv_matches_torch(setup):
    g, a, x = setup
    m = GCNConv(out_channels=C)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g))

    at = torch.as_tensor(a.T) + torch.eye(N, dtype=torch.float64)
    deg = at.sum(1)
    dis = torch.where(deg > 0, deg.pow(-0.5), torch.zeros_like(deg))
    norm = dis[:, None] * at * dis[None, :]
    w = torch.as_tensor(np.asarray(params["params"]["weight"]), dtype=torch.float64)
    b = torch.as_tensor(np.asarray(params["params"]["bias"]), dtype=torch.float64)
    want = (norm @ (torch.as_tensor(x, dtype=torch.float64) @ w) + b).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_gconvgru_matches_torch(setup):
    g, a, x = setup
    m = GConvGRU(out_channels=C, K=K)
    h = np.random.default_rng(1).normal(size=(N, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g, jnp.asarray(h)))

    p = params["params"]
    t = lambda name: torch.as_tensor(np.asarray(p[name]), dtype=torch.float64)
    bx = torch_cheb_basis(a, x, K)
    bh = torch_cheb_basis(a, h, K)
    z = torch.sigmoid(bx @ t("w_xz") + bh @ t("w_hz") + t("b_z"))
    r = torch.sigmoid(bx @ t("w_xr") + bh @ t("w_hr") + t("b_r"))
    bhr = torch_cheb_basis(a, (torch.as_tensor(h, dtype=torch.float64) * r).numpy(), K)
    htil = torch.tanh(bx @ t("w_xh") + bhr @ t("w_hh") + t("b_h"))
    want = (z * torch.as_tensor(h, dtype=torch.float64) + (1 - z) * htil).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_dcrnn_matches_torch(setup):
    g, a, x = setup
    m = DCRNN(out_channels=C, K=K)
    h = np.random.default_rng(1).normal(size=(N, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g, jnp.asarray(h)))

    # independent dense torch: P_f = D_O^-1 W, P_b = D_I^-1 W^T
    A = torch.as_tensor(a)
    deg_out = A.sum(1).clamp(min=1e-12)
    deg_in = A.sum(0).clamp(min=1e-12)
    pf = A / deg_out[:, None]
    pb = A.t() / deg_in[:, None]

    def basis(v):
        v = torch.as_tensor(v, dtype=torch.float64)
        outs = []
        for pmat in (pf, pb):
            ts = [v]
            ts.append(pmat @ v)
            for _ in range(2, K):
                ts.append(2 * pmat @ ts[-1] - ts[-2])
            outs.extend(ts)
        return torch.cat(outs, dim=-1)

    p = params["params"]
    t = lambda name: torch.as_tensor(np.asarray(p[name]), dtype=torch.float64)
    xh = np.concatenate([x, h], axis=-1)
    zr = torch.sigmoid(basis(xh) @ t("w_zr") + t("b_zr"))
    z, r = zr.chunk(2, dim=-1)
    xhr = np.concatenate([x, (torch.as_tensor(h, dtype=torch.float64) * r).numpy()], -1)
    htil = torch.tanh(basis(xhr) @ t("w_h") + t("b_h"))
    want = (z * torch.as_tensor(h, dtype=torch.float64) + (1 - z) * htil).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_tgcn_matches_torch(setup):
    g, a, x = setup
    m = TGCN(out_channels=C)
    h = np.random.default_rng(1).normal(size=(N, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), g)
    ours = np.asarray(m.apply(params, jnp.asarray(x), g, jnp.asarray(h)))

    at = torch.as_tensor(a.T) + torch.eye(N, dtype=torch.float64)
    deg = at.sum(1)
    dis = deg.pow(-0.5)
    norm = dis[:, None] * at * dis[None, :]
    p = params["params"]

    def conv(name, v):
        w = torch.as_tensor(np.asarray(p[name]["weight"]), dtype=torch.float64)
        b = torch.as_tensor(np.asarray(p[name]["bias"]), dtype=torch.float64)
        return norm @ (torch.as_tensor(v, dtype=torch.float64) @ w) + b

    def dense(name, v):
        w = torch.as_tensor(np.asarray(p[name]["kernel"]), dtype=torch.float64)
        b = torch.as_tensor(np.asarray(p[name]["bias"]), dtype=torch.float64)
        return v @ w + b

    ht = torch.as_tensor(h, dtype=torch.float64)
    z = torch.sigmoid(dense("linear_z", torch.cat([conv("conv_z", x), ht], -1)))
    r = torch.sigmoid(dense("linear_r", torch.cat([conv("conv_r", x), ht], -1)))
    htil = torch.tanh(dense("linear_h", torch.cat([conv("conv_h", x), ht * r], -1)))
    want = (z * ht + (1 - z) * htil).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_mixprop_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import MixProp

    B, N_, T_, C_ = 2, 9, 6, 4
    x = rng.normal(size=(B, N_, T_, C_)).astype(np.float32)
    a = rng.uniform(size=(N_, N_)).astype(np.float32)
    m = MixProp(c_out=5, gdep=3, dropout=0.0, alpha=0.1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(a))
    ours = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(a)))

    # independent torch impl of reference mtgnn.py:84-102 in (B,N,T,C) layout
    at = torch.as_tensor(a, dtype=torch.float64) + torch.eye(N_, dtype=torch.float64)
    at = at / at.sum(1, keepdim=True)
    h = torch.as_tensor(x, dtype=torch.float64)
    outs = [h]
    cur = h
    for _ in range(3):
        cur = 0.1 * h + 0.9 * torch.einsum("vw,bwtc->bvtc", at, cur)
        outs.append(cur)
    cat = torch.cat(outs, dim=-1)
    w = torch.as_tensor(np.asarray(params["params"]["mlp"]["kernel"]),
                        dtype=torch.float64)
    b = torch.as_tensor(np.asarray(params["params"]["mlp"]["bias"]),
                        dtype=torch.float64)
    want = (cat @ w + b).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_spatial_attention_matches_torch(rng):
    from pytorch_geometric_temporal_tpu.models.attention import SpatialAttention

    B, N_, F_, T_ = 2, 7, 3, 5
    x = rng.normal(size=(B, N_, F_, T_)).astype(np.float32)
    m = SpatialAttention(in_channels=F_, num_of_vertices=N_, num_of_timesteps=T_)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(params, jnp.asarray(x)))

    p = {k: torch.as_tensor(np.asarray(v), dtype=torch.float64)
         for k, v in params["params"].items()}
    xt = torch.as_tensor(x, dtype=torch.float64)
    lhs = torch.matmul(torch.matmul(xt, p["W1"]), p["W2"])
    rhs = torch.matmul(p["W3"], xt).transpose(-1, -2)
    s = torch.matmul(p["Vs"], torch.sigmoid(torch.matmul(lhs, rhs) + p["bs"]))
    want = torch.softmax(s, dim=1).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-5)
