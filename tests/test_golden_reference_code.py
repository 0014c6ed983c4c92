"""Exact-code oracles: line-level transcriptions of the REFERENCE algorithms.

The other golden tests (test_golden_torch.py, test_golden_models.py) compare
against builder-written re-derivations of the documented math — a
transcription error made identically in both the oracle and the
implementation would pass.  This file closes that hole for the two layer
families the whole model zoo leans on, by transcribing the *actual
algorithms* the reference executes, step by step, in f64 numpy:

- PyG ``ChebConv.__norm__`` + ``ChebConv.forward`` as called by reference
  ``nn/recurrent/gconv_gru.py:55-139`` (and every other Cheb-based cell):
  remove_self_loops -> get_laplacian(norm) -> scale 2/lambda_max ->
  masked_fill(inf, 0) -> add_self_loops(fill_value=-1.0) -> K-term
  recurrence with propagate() aggregating messages x[row] at col.
- Reference ``ChebConvAttention.forward``
  (``nn/attention/astgcn.py:118-190``): the same __norm__, then the quirky
  forward — T_0 scaled by the ATTENTION DIAGONAL, hop-1 messages scaled by
  per-batch ``Att_norm = norm * att[:, row, col]``, hops >= 2 using the RAW
  norm, all propagated over the TRANSPOSED edge list.

These oracles are transcriptions (same op order, same masking, same edge-set
bookkeeping), not re-derivations — matching them rules out shared-mistake
false passes for the Chebyshev family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models import GConvGRU
from pytorch_geometric_temporal_tpu.models.attention.astgcn import (
    ChebConvAttention,
)
from pytorch_geometric_temporal_tpu.models.conv import ChebConv
from pytorch_geometric_temporal_tpu.ops import Graph

N, F, C = 9, 4, 6


# ---------------------------------------------------------------------------
# Transcribed reference algorithms (f64 numpy, edge-list form)
# ---------------------------------------------------------------------------

def _remove_self_loops(edge_index, edge_weight):
    """PyG torch_geometric.utils.remove_self_loops."""
    mask = edge_index[0] != edge_index[1]
    return edge_index[:, mask], edge_weight[mask]


def _add_self_loops(edge_index, edge_weight, fill_value, num_nodes):
    """PyG torch_geometric.utils.add_self_loops (append one loop per node)."""
    loop = np.arange(num_nodes)
    edge_index = np.concatenate(
        [edge_index, np.stack([loop, loop])], axis=1
    )
    edge_weight = np.concatenate(
        [edge_weight, np.full(num_nodes, fill_value, edge_weight.dtype)]
    )
    return edge_index, edge_weight


def _get_laplacian(edge_index, edge_weight, normalization, num_nodes):
    """PyG torch_geometric.utils.get_laplacian (row-side degree scatter)."""
    row, col = edge_index[0], edge_index[1]
    deg = np.zeros(num_nodes)
    np.add.at(deg, row, edge_weight)
    if normalization is None:
        edge_index, _ = _add_self_loops(
            edge_index, edge_weight, 0.0, num_nodes
        )
        edge_weight = np.concatenate([-edge_weight, deg])
    elif normalization == "sym":
        with np.errstate(divide="ignore"):
            deg_inv_sqrt = deg ** -0.5
        deg_inv_sqrt[np.isinf(deg_inv_sqrt)] = 0
        edge_weight = deg_inv_sqrt[row] * edge_weight * deg_inv_sqrt[col]
        edge_index, edge_weight = _add_self_loops(
            edge_index, -edge_weight, 1.0, num_nodes
        )
    elif normalization == "rw":
        with np.errstate(divide="ignore"):
            deg_inv = 1.0 / deg
        deg_inv[np.isinf(deg_inv)] = 0
        edge_weight = deg_inv[row] * edge_weight
        edge_index, edge_weight = _add_self_loops(
            edge_index, -edge_weight, 1.0, num_nodes
        )
    return edge_index, edge_weight


def ref_cheb_norm(edge_index, edge_weight, num_nodes, normalization,
                  lambda_max):
    """Transcription of PyG ``ChebConv.__norm__`` == reference
    ``ChebConvAttention.__norm__`` (astgcn.py:82-118)."""
    edge_index, edge_weight = _remove_self_loops(edge_index, edge_weight)
    edge_index, edge_weight = _get_laplacian(
        edge_index, edge_weight, normalization, num_nodes
    )
    if lambda_max is None:
        lambda_max = 2.0
    edge_weight = (2.0 * edge_weight) / lambda_max
    edge_weight[edge_weight == np.inf] = 0
    edge_index, edge_weight = _add_self_loops(
        edge_index, edge_weight, -1.0, num_nodes
    )
    return edge_index, edge_weight


def _propagate(edge_index, x, norm, num_nodes):
    """PyG MessagePassing.propagate(aggr='add', flow=source_to_target):
    out[col] += norm_e * x[row].  x: (N, F) or (B, N, F); norm: (E,) or
    (B, E)."""
    row, col = edge_index[0], edge_index[1]
    msgs = norm[..., :, None] * x[..., row, :]
    out = np.zeros(x.shape[:-2] + (num_nodes, x.shape[-1]))
    if x.ndim == 2:
        np.add.at(out, col, msgs)
    else:
        for b in range(x.shape[0]):
            np.add.at(out[b], col, msgs[b])
    return out


def ref_cheb_conv(x, edge_index, edge_weight, num_nodes, weights, bias,
                  normalization="sym", lambda_max=None):
    """Transcription of PyG ``ChebConv.forward`` (reference call sites:
    nn/recurrent/gconv_gru.py:119-139).  ``weights``: (K, F_in, F_out)."""
    edge_index, norm = ref_cheb_norm(
        edge_index, edge_weight, num_nodes, normalization, lambda_max
    )
    tx_0 = x
    out = tx_0 @ weights[0]
    if len(weights) > 1:
        tx_1 = _propagate(edge_index, x, norm, num_nodes)
        out = out + tx_1 @ weights[1]
    for k in range(2, len(weights)):
        tx_2 = _propagate(edge_index, tx_1, norm, num_nodes)
        tx_2 = 2.0 * tx_2 - tx_0
        out = out + tx_2 @ weights[k]
        tx_0, tx_1 = tx_1, tx_2
    if bias is not None:
        out = out + bias
    return out


def ref_gconv_gru(x, edge_index, edge_weight, num_nodes, h, p,
                  normalization="sym", lambda_max=None):
    """Transcription of reference GConvGRU.forward
    (nn/recurrent/gconv_gru.py:119-170): six ChebConvs + gate arithmetic."""
    def conv(name, v):
        return ref_cheb_conv(v, edge_index, edge_weight, num_nodes,
                             p[f"{name}_w"], p[f"{name}_b"],
                             normalization, lambda_max)

    if h is None:
        h = np.zeros((x.shape[0], p["conv_x_z_w"].shape[-1]))
    z = conv("conv_x_z", x) + conv("conv_h_z", h)
    z = 1.0 / (1.0 + np.exp(-z))
    r = conv("conv_x_r", x) + conv("conv_h_r", h)
    r = 1.0 / (1.0 + np.exp(-r))
    h_tilde = conv("conv_x_h", x) + conv("conv_h_h", h * r)
    h_tilde = np.tanh(h_tilde)
    return z * h + (1 - z) * h_tilde


def ref_chebconv_attention(x, edge_index, edge_weight, num_nodes,
                           spatial_attention, weights, bias,
                           normalization="sym", lambda_max=None):
    """Transcription of reference ``ChebConvAttention.forward``
    (nn/attention/astgcn.py:118-190).  x: (B, N, F_in); att: (B, N, N);
    weights: (K, F_in, F_out)."""
    edge_index, norm = ref_cheb_norm(
        edge_index, edge_weight, num_nodes, normalization, lambda_max
    )
    row, col = edge_index[0], edge_index[1]
    att_norm = norm[None, :] * spatial_attention[:, row, col]  # (B, E)
    # TAx_0 = (eye(N) * att).permute(0,2,1) @ x  — x scaled by att diagonal
    eye_att = np.eye(num_nodes)[None] * spatial_attention
    tax_0 = np.transpose(eye_att, (0, 2, 1)) @ x
    out = tax_0 @ weights[0]
    edge_index_t = edge_index[[1, 0]]
    if len(weights) > 1:
        tax_1 = _propagate(edge_index_t, tax_0, att_norm, num_nodes)
        out = out + tax_1 @ weights[1]
    for k in range(2, len(weights)):
        tax_2 = _propagate(edge_index_t, tax_1,
                           np.broadcast_to(norm, att_norm.shape), num_nodes)
        tax_2 = 2.0 * tax_2 - tax_0
        out = out + tax_2 @ weights[k]
        tax_0, tax_1 = tax_1, tax_2
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Fixtures: a nasty graph — self-loops, an isolated node, a sink node
# ---------------------------------------------------------------------------

@pytest.fixture
def nasty_graph(rng):
    ei = np.unique(rng.integers(0, N - 1, size=(2, 24)), axis=1)
    # self-loops (PyG removes them before the Laplacian — quirk under test)
    ei = np.concatenate([ei, np.array([[2, 5], [2, 5]])], axis=1)
    # node N-1 is fully isolated (zero degree -> inf masking under test)
    w = rng.uniform(0.5, 2.0, size=ei.shape[1])
    g = Graph.from_edge_index(ei, w, num_nodes=N)
    return ei, w, g


CASES = [("sym", None), ("sym", 1.5), ("rw", 1.3), (None, 4.0)]


@pytest.mark.parametrize("normalization,lam", CASES)
def test_chebconv_matches_reference_code(nasty_graph, rng, normalization,
                                         lam):
    ei, w, g = nasty_graph
    K = 3
    x = rng.normal(size=(N, F))
    m = ChebConv(out_channels=C, K=K, normalization=normalization)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32), g,
                    lambda_max=lam)
    ours = np.asarray(
        m.apply(params, jnp.asarray(x, jnp.float32), g, lambda_max=lam)
    )

    # our stacked weight (K*F, C) -> reference per-k weights (K, F, C)
    ws = np.asarray(params["params"]["weight"], np.float64)
    weights = np.stack([ws[k * F:(k + 1) * F] for k in range(K)])
    bias = np.asarray(params["params"]["bias"], np.float64)
    ref = ref_cheb_conv(x, ei, w, N, weights, bias, normalization, lam)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-5)


def test_gconv_gru_matches_reference_code(nasty_graph, rng):
    ei, w, g = nasty_graph
    K = 3
    x = rng.normal(size=(N, F))
    h0 = rng.normal(size=(N, C))
    m = GConvGRU(out_channels=C, K=K)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x, jnp.float32), g,
                    jnp.asarray(h0, jnp.float32))
    ours = np.asarray(
        m.apply(params, jnp.asarray(x, jnp.float32), g,
                jnp.asarray(h0, jnp.float32))
    )

    # our fused per-gate weights -> the reference's six ChebConvs.  Our
    # single per-gate bias b_z == reference conv_x_z.bias + conv_h_z.bias;
    # load the reference halves as (ours, zeros).
    pp = params["params"]

    def split(name, fin):
        ws = np.asarray(pp[name], np.float64)
        return np.stack([ws[k * fin:(k + 1) * fin] for k in range(K)])

    p = {}
    for gate, suffix in (("z", "z"), ("r", "r"), ("h", "h")):
        p[f"conv_x_{suffix}_w"] = split(f"w_x{gate}", F)
        p[f"conv_h_{suffix}_w"] = split(f"w_h{gate}", C)
        p[f"conv_x_{suffix}_b"] = np.asarray(pp[f"b_{gate}"], np.float64)
        p[f"conv_h_{suffix}_b"] = np.zeros(C)
    ref = ref_gconv_gru(x, ei, w, N, h0, p)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-5)


@pytest.mark.parametrize("normalization,lam", [("sym", None), ("rw", 1.7)])
def test_chebconv_attention_matches_reference_code(nasty_graph, rng,
                                                   normalization, lam):
    ei, w, g = nasty_graph
    K, B = 3, 2
    x = rng.normal(size=(B, N, F))
    att_logits = rng.normal(size=(B, N, N))
    att = np.exp(att_logits) / np.exp(att_logits).sum(1, keepdims=True)

    m = ChebConvAttention(out_channels=C, K=K, normalization=normalization)
    if lam is not None:
        # our module computes lambda_max in-trace by power iteration for
        # non-sym; pin the exact value through a wrapped graph is not part
        # of the public API, so compare at the module's own lambda.
        from pytorch_geometric_temporal_tpu.ops.graph import (
            lambda_max as power_lambda_max,
        )
        lam = float(power_lambda_max(g.remove_self_loops(), normalization))
    params = m.init(jax.random.PRNGKey(2), jnp.asarray(x, jnp.float32), g,
                    jnp.asarray(att, jnp.float32))
    ours = np.asarray(
        m.apply(params, jnp.asarray(x, jnp.float32), g,
                jnp.asarray(att, jnp.float32))
    )

    weights = np.asarray(params["params"]["weight"], np.float64)
    bias = np.asarray(params["params"]["bias"], np.float64)
    ref = ref_chebconv_attention(x, ei, w, N, att, weights, bias,
                                 normalization, lam)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-5)
