"""Benchmark: DCRNN seq2seq training throughput + accuracy protocol.

Throughput mirrors the reference's headline index-batching protocol
(``examples/indexBatching/DCRNN/pems_main.py``): BatchedDCRNN-equivalent
seq2seq (K=3, in=out=num_features), masked MAE on z-score de-normalized
values, Adam(1e-3), window 12→12 on the METR-LA graph (207 nodes, 1722
edges, 2 features — reference ``test/index_test.py:37-40``).

Accuracy mirrors the reference's canonical snapshot-loop protocol
(``examples/recurrent/gconvgru_example.py``): GConvGRU(4→32, K=1) + linear
head on Hungary chickenpox (bundled in-package), train_ratio 0.2, Adam(0.01),
200 full-BPTT epochs, hidden state reset per snapshot exactly as the
reference script does; reports test MSE/MAE on the standardized targets.
The reference script's published ballpark is MSE ≈ 1.0.

Precision note: the JAX throughput path trains with the package's
recommended TPU recipe — f32 master params, **bf16 compute** — while the
torch-CPU baseline runs f32 (torch CPU autocast-bf16 is slower than f32 on
this host, so f32 is the stronger baseline).  ``vs_baseline`` therefore
compares each stack's best practical configuration, not like-for-like
dtypes; both dtypes are tagged in the JSON record.  The accuracy protocol
runs f32 end to end.

Prints ONE JSON line:
  {"metric": ..., "value": snapshots/sec/chip (device-only, slope method),
   "value_rawwall": snapshots/sec incl. dispatch, "unit": ...,
   "vs_baseline": r, "vs_baseline_rawwall": r_wall, "final_loss": ...,
   "compute_dtype": ..., "baseline_dtype": ...,
   "chickenpox_gconvgru_test_mse": ..., "chickenpox_gconvgru_test_mae": ...,
   "bcsr_*": kernel metrics, "metrla_*": METR-LA accuracy-parity fields
   (reduced-config run of benchmarks/metrla_protocol.py)}

``vs_baseline`` is the ratio against a torch-CPU implementation of the same
model run on this host (the reference stack itself is not installable here;
its GPU numbers are not published — BASELINE.md).  The torch baseline uses
dense-adjacency matmuls (MKL-friendly, i.e. generous to the baseline).

Real METR-LA data is used when staged (see data/_io.py search paths);
otherwise synthetic data with identical shapes — throughput is shape-bound,
not value-bound.
"""

import json
import time

import numpy as np

B, T, N, F, K = 64, 12, 207, 2, 3
STEPS = 50


def make_data(rng):
    ei = np.unique(rng.integers(0, N, size=(2, 1722)), axis=1)
    w = rng.uniform(0.1, 1.0, ei.shape[1]).astype(np.float32)
    x = rng.normal(size=(B, T, N, F)).astype(np.float32)
    y = rng.normal(size=(B, T, N, F)).astype(np.float32)
    return ei, w, x, y


def bench_jax(ei, w, x_np, y_np):
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.models import DCRNNSeq
    from pytorch_geometric_temporal_tpu.ops import Graph
    from pytorch_geometric_temporal_tpu.train import masked_mae_loss
    from pytorch_geometric_temporal_tpu.train.precision import bf16_policy

    g = Graph.from_edge_index(ei, w, num_nodes=N)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    mean, std = jnp.float32(54.0), jnp.float32(20.0)  # METR-LA-like stats

    model = DCRNNSeq(out_channels=F, K=K, unroll=T)
    params = model.init(jax.random.PRNGKey(0), x, g)
    opt = optax.adam(1e-3)

    # The package's recommended TPU recipe: f32 master params, bf16 compute
    # (train/precision.py) — halves HBM traffic, MXU-native matmuls; grads
    # arrive f32 through the differentiated cast, loss math stays f32.
    xc = bf16_policy.cast_to_compute(x)
    gc = bf16_policy.cast_to_compute(g)

    def loss_fn(p):
        pred = model.apply(bf16_policy.cast_to_compute(p), xc, gc)
        pred = bf16_policy.cast_output(pred)
        return masked_mae_loss(pred * std + mean, y * std + mean)

    @jax.jit
    def run(p, st, n):
        def body(_, carry):
            p, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, st = opt.update(grads, st)
            return optax.apply_updates(p, up), st

        p, st = jax.lax.fori_loop(0, n, body, (p, st))
        return p, st, loss_fn(p)

    # Dispatch-corrected timing: this platform's remote tunnel adds a FIXED
    # ~25 ms per execution (measured constant from 1 to 1000 fori_loop
    # iterations), so the executable is timed at two loop lengths (one
    # compile — the bound is traced) and the slope taken.
    lo = STEPS // 5
    st = opt.init(params)
    params, st, _ = run(params, st, STEPS)  # compile + warm
    jax.block_until_ready(params)
    t_hi = t_lo = float("inf")
    loss = None
    # min over 5 reps: the remote tunnel adds multi-ms jitter per
    # dispatch; 3 reps left ~10% run-to-run variance in the slope.
    for _ in range(5):
        t0 = time.perf_counter()
        params, st, loss = run(params, st, STEPS)
        jax.block_until_ready(params)
        t_hi = min(t_hi, time.perf_counter() - t0)
        t0 = time.perf_counter()
        params, st, loss = run(params, st, lo)
        jax.block_until_ready(params)
        t_lo = min(t_lo, time.perf_counter() - t0)
    dt = (t_hi - t_lo) / (STEPS - lo)
    dt_raw = t_hi / STEPS  # raw wall per iter, incl. the fixed dispatch cost
    return B * T / dt, B * T / dt_raw, float(loss)


def bench_torch_cpu(ei, w, x_np, y_np, steps=3):
    """Same model/protocol in plain torch on CPU (dense adjacency form)."""
    import torch

    torch.manual_seed(0)
    dev = "cpu"
    a = torch.zeros(N, N)
    a[torch.as_tensor(ei[0]), torch.as_tensor(ei[1])] = torch.as_tensor(w)
    deg_out = a.sum(1).clamp(min=1e-12)
    deg_in = a.sum(0).clamp(min=1e-12)
    p_fwd = (a / deg_out[:, None])  # D_O^-1 W
    p_bwd = (a.t() / deg_in[:, None])  # D_I^-1 W^T

    class DConv(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.empty(2, K, cin, cout))
            torch.nn.init.xavier_uniform_(self.weight)
            self.bias = torch.nn.Parameter(torch.zeros(cout))

        def forward(self, x):  # x: (B, N, C)
            out = x @ self.weight[0, 0] + x @ self.weight[1, 0]
            txs = []
            for p_i, wdir in ((p_fwd, 0), (p_bwd, 1)):
                t0_, t1_ = x, torch.einsum("ij,bjc->bic", p_i, x)
                out = out + t1_ @ self.weight[wdir, 1]
                for kk in range(2, K):
                    t2_ = 2 * torch.einsum("ij,bjc->bic", p_i, t1_) - t0_
                    out = out + t2_ @ self.weight[wdir, kk]
                    t0_, t1_ = t1_, t2_
            return out + self.bias

    class DCRNNTorch(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.zr = DConv(cin + cout, 2 * cout)
            self.h = DConv(cin + cout, cout)
            self.cout = cout

        def forward(self, xs):  # (B, T, N, C)
            h = torch.zeros(xs.shape[0], N, self.cout)
            outs = []
            for t in range(xs.shape[1]):
                xt = xs[:, t]
                zr = torch.sigmoid(self.zr(torch.cat([xt, h], -1)))
                z, r = zr.chunk(2, -1)
                ht = torch.tanh(self.h(torch.cat([xt, r * h], -1)))
                h = z * h + (1 - z) * ht
                outs.append(h)
            return torch.stack(outs, 1)

    def masked_mae(pred, true):
        mask = (true != 0).float()
        mask = mask / mask.mean().clamp(min=1e-16)
        loss = (pred - true).abs() * mask
        return torch.nan_to_num(loss).mean()

    model = DCRNNTorch(F, F)
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.as_tensor(x_np)
    y = torch.as_tensor(y_np)
    mean, std = 54.0, 20.0
    # warmup
    loss = masked_mae(model(x) * std + mean, y * std + mean)
    loss.backward()
    optim.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        optim.zero_grad()
        loss = masked_mae(model(x) * std + mean, y * std + mean)
        loss.backward()
        optim.step()
    dt = time.perf_counter() - t0
    return steps * B * T / dt


def bench_accuracy_chickenpox(epochs=200):
    """Reference accuracy protocol: GConvGRU on Hungary chickenpox.

    Mirrors ``examples/recurrent/gconvgru_example.py`` exactly: lags=4,
    GConvGRU(4->32, K=1) + Linear(32->1) head, relu between, train_ratio
    0.2, Adam(0.01), 200 epochs of full-sequence BPTT with the MSE averaged
    over snapshots, hidden state reset every snapshot (the reference script
    never threads H).  Returns (test_mse, test_mae) on the standardized
    targets — the reference script's published ballpark is MSE ~= 1.0.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.data import ChickenpoxDatasetLoader
    from pytorch_geometric_temporal_tpu.models import GConvGRU
    from pytorch_geometric_temporal_tpu.signal import (
        StackedSignal,
        temporal_signal_split,
    )
    from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            h = GConvGRU(out_channels=32, K=1, name="recurrent")(x, graph)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    dataset = ChickenpoxDatasetLoader().get_dataset(lags=4)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    train = StackedSignal.from_signal(train_sig)
    test = StackedSignal.from_signal(test_sig)
    model = Net()
    params = model.init(
        jax.random.PRNGKey(42), train.features[0], train.graph()
    )

    def loss_and_state(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    trainer = SnapshotTrainer(loss_and_state, optax.adam(1e-2))
    params, _ = trainer.fit(params, train, epochs=epochs, log_every=epochs)
    test_mse = float(trainer.evaluate(params, test))

    def mae_and_state(p, carry, x, y, g):
        return jnp.mean(jnp.abs(model.apply(p, x, g) - y)), carry

    mae_eval = SnapshotTrainer(mae_and_state, optax.adam(1e-2))
    test_mae = float(mae_eval.evaluate(params, test))
    return test_mse, test_mae


def bench_accuracy_wikimaths(epochs=50):
    """Reference case-study protocol: GConvGRU on WikiMaths.

    Mirrors the reference's published WikiMaths case study exactly
    (``docs/source/notes/introduction.rst:310-378``): lags=14,
    train_ratio 0.5, GConvGRU(14→32, K=2) + relu + Linear(32→1),
    Adam(0.01), 50 epochs of per-snapshot backprop, test MSE averaged
    over snapshots.  The reference publishes **MSE 0.5264** for this
    protocol — the only in-docs accuracy number the reference ships.
    Returns None when the dataset bytes are not staged (zero-egress
    environments; gated like every download-backed loader).
    """
    from pytorch_geometric_temporal_tpu.data._io import available

    if not available("wikivital_mathematics.json"):
        return None
    import flax.linen as nn
    import jax
    import optax

    from pytorch_geometric_temporal_tpu.data import WikiMathsDatasetLoader
    from pytorch_geometric_temporal_tpu.models import GConvGRU
    from pytorch_geometric_temporal_tpu.signal import (
        StackedSignal,
        temporal_signal_split,
    )
    from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            h = GConvGRU(out_channels=32, K=2, name="recurrent")(x, graph)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    dataset = WikiMathsDatasetLoader().get_dataset(lags=14)
    train_sig, test_sig = temporal_signal_split(dataset, 0.5)
    train = StackedSignal.from_signal(train_sig)
    test = StackedSignal.from_signal(test_sig)
    model = Net()
    params = model.init(jax.random.PRNGKey(1), train.features[0],
                        train.graph())

    def loss_and_state(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    trainer = SnapshotTrainer(loss_and_state, optax.adam(1e-2))
    params, _ = trainer.fit(params, train, epochs=epochs, log_every=epochs)
    return float(trainer.evaluate(params, test))


def bench_kernel_edges(n=50_000, deg=40, f=64, band=96, iters=400):
    """Hybrid-BCSR kernel throughput on a banded 50k-node graph.

    Returns (edges/s, segment edges/s, MFU %).  MFU counts the FLOPs the
    MXU actually executes (nnzb dense 128x128xF tile multiplies) against
    the v5e chip's ~197 TFLOP/s bf16 peak; edges/s counts useful edges.
    """
    import jax
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import (
        BCSRMatrix, Graph, bcsr_spmm, spmm_segment,
    )

    rng = np.random.default_rng(1)
    e = n * deg
    e_loc = int(e * 0.95)
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    deg_r = np.bincount(r, weights=w, minlength=n).astype(np.float32)
    w = w / np.maximum(deg_r[r], 1e-6)  # bounded iterates in the loop
    g = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)
    mat = BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                min_block_edges="auto", expected_f=f)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    def timed(fn, n_iters):
        return device_time_per_iter(fn, x, iters=n_iters)

    dt_bcsr = timed(lambda a: bcsr_spmm(mat, a), iters)
    dt_seg = timed(lambda a: spmm_segment(g, a), max(iters // 4, 20))
    tile_flops = mat.fwd.nnzb * 2 * 128 * 128 * f
    mfu = tile_flops / dt_bcsr / 197e12 * 100.0
    # Roofline: the kernel is HBM-bound, not MXU-bound — the binding metric
    # is achieved bytes/s vs the v5e's ~819 GB/s peak (see
    # ops/bcsr.py:hybrid_hbm_bytes and benchmarks/bcsr_breakdown.py).
    from pytorch_geometric_temporal_tpu.ops.bcsr import hybrid_hbm_bytes

    hbm_gbs = hybrid_hbm_bytes(mat.fwd, f)["total"] / dt_bcsr / 1e9
    return e / dt_bcsr, e / dt_seg, mfu, hbm_gbs


def bench_model_train_large_n(n=50_000, deg=40, f=32, hidden=64, t=4,
                              band=96, iters=24):
    """Model-level large-N training throughput: DCRNNSeq fwd+bwd+Adam.

    Proves the kernel-level BCSR win survives a REAL training step: one
    jitted step = DCRNNSeq (K=2, scan over T) forward, MSE loss, full
    backward through the custom BCSR VJP, Adam update — over prebuilt
    ``DiffusionOperators`` (bcsr=True, bf16 tiles) vs the same model on the
    segment path.  Returns (bcsr edges/s, segment edges/s).

    Edge-rate convention: ``edges/s = E · T · n_spmm_fwd / step_time`` with
    ``n_spmm_fwd = 4`` (2 diffusion-basis builds per cell step × 2
    directions × (K−1)=1 hop each) — the FORWARD aggregations only, so the
    number is conservative (the backward pass adds ~1 transpose spmm per
    forward spmm plus the dense-gate grads, all inside step_time).  The
    same convention on both paths makes the ratio exact.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.models import DCRNNSeq
    from pytorch_geometric_temporal_tpu.ops import Graph
    from pytorch_geometric_temporal_tpu.ops.operators import (
        DiffusionOperators,
    )
    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    rng = np.random.default_rng(3)
    e = n * deg
    e_loc = int(e * 0.95)
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    g = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)

    x = jnp.asarray(rng.normal(size=(1, t, n, f)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, t, n, hidden)).astype(np.float32))
    model = DCRNNSeq(out_channels=hidden, K=2)
    opt = optax.adam(1e-3)

    def measure(operator):
        params = model.init(jax.random.PRNGKey(0), x, operator)
        opt_state = opt.init(params)

        def loss_fn(p, xb, yb, gop):
            pred = model.apply(p, xb, gop)
            return jnp.mean((pred - yb) ** 2)

        def step(carry, xb, yb, gop):
            p, st = carry
            _, grads = jax.value_and_grad(loss_fn)(p, xb, yb, gop)
            updates, st = opt.update(grads, st, p)
            return (optax.apply_updates(p, updates), st)

        dt = device_time_per_iter(step, (params, opt_state), iters=iters,
                                  operands=(x, y, operator))
        return e * t * 4 / dt

    from pytorch_geometric_temporal_tpu import config_override

    ops_bcsr = DiffusionOperators.from_graph(g, bcsr=True,
                                             dtype=jnp.bfloat16)
    ops_seg = DiffusionOperators.from_graph(g, bcsr=False)
    bcsr_eps = measure(ops_bcsr)
    # pin the baseline to the segment backend — auto-dispatch would
    # otherwise route the plain-Graph operators through BCSR too
    with config_override(spmm_backend="segment"):
        seg_eps = measure(ops_seg)
    return bcsr_eps, seg_eps


def bench_reorder_recovery(n=20_000, deg=40, f=64, band=96, iters=200):
    """Kernel-time recovery from the reordering pass on a scrambled graph.

    Builds the banded benchmark graph under randomly permuted node ids
    (the arbitrary-sensor-id case) and times the hybrid kernel with and
    without ``reorder='auto'``.  Returns (plain seconds, reordered
    seconds) per aggregation; the ratio is the driver-visible speedup
    (full measured table: ``benchmarks/reorder_sweep.py``).
    """
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import (
        BCSRMatrix, Graph, bcsr_spmm,
    )
    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    rng = np.random.default_rng(2)
    e = n * deg
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-band, band + 1, size=e), 0, n - 1)
    scram = rng.permutation(n)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    d = np.bincount(r, weights=w, minlength=n).astype(np.float32)
    w = w / np.maximum(d[r], 1e-6)
    g = Graph.from_edge_index(np.stack([scram[s], scram[r]]), w, num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    times = []
    # the reordered kernel runs ~100 µs/iter: at the slope method's lo/hi
    # split the timed delta must dominate the remote tunnel's run-to-run
    # noise, so the fast path gets 4x the iterations of the 2 ms plain path
    for reorder, n_iters in ((None, max(iters // 4, 20)), ("auto", 2 * iters)):
        mat = BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                    min_block_edges="auto", expected_f=f,
                                    reorder=reorder)
        times.append(device_time_per_iter(
            lambda a, m: bcsr_spmm(m, a), x, iters=n_iters, operands=(mat,),
        ))
    return times[0], times[1]


def bench_dynamic_edges(n=20_000, deg=30, t=4, f=64, band=64):
    """Stacked dynamic-edge sequence through the tiled kernel in a scan.

    The capability the segment path used to own exclusively (per-step
    edge lists are traced inside a scan): per-snapshot BCSR operators
    are host-built, stacked (``ops.stack_bcsr``), and scanned — one
    compiled kernel serves every step.  Returns edges/s over the whole
    T-step scan (dispatch-corrected).

    Config history: rounds 3-4 pinned n=10k/T=3 because the N=20k/T=4
    compile took ~6 min; the bisect (``benchmarks/compile_bisect.py``)
    showed that was the operator baked into the HLO as constants (123 MB
    payload on the remote compile path), not a kernel-scaling problem —
    as a jit operand it compiles in <1 s, so the config is raised.
    """
    import jax
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import (
        BCSRMatrix, Graph, bcsr_spmm, stack_bcsr,
    )

    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(t):
        e = n * deg
        s = rng.integers(0, n, size=e)
        r = np.clip(s + rng.integers(-band, band + 1, size=e), 0, n - 1)
        w = rng.uniform(0.1, 1.0, e).astype(np.float32)
        d = np.bincount(r, weights=w, minlength=n).astype(np.float32)
        w = w / np.maximum(d[r], 1e-6)
        graphs.append(Graph.from_edge_index(np.stack([s, r]), w,
                                            num_nodes=n))
    mats = [BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                  min_block_edges="auto", pack=3)
            for g in graphs]
    st = stack_bcsr(mats)
    e_total = sum(g.num_edges for g in graphs)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    def scan_once(h, st):
        def step(h, mat_t):
            return jnp.tanh(bcsr_spmm(mat_t, h)), None

        h, _ = jax.lax.scan(step, h, st)
        return h

    # device_time_per_iter syncs via a scalar host fetch (the only
    # reliable sync on this platform's tunnel) and passes the stacked
    # operator as a jit operand, not an HLO constant
    dt_scan = device_time_per_iter(scan_once, x, iters=300, operands=(st,))
    return e_total / dt_scan


def main():
    rng = np.random.default_rng(0)
    ei, w, x, y = make_data(rng)
    jax_tput, jax_tput_raw, loss = bench_jax(ei, w, x, y)
    try:
        torch_tput = bench_torch_cpu(ei, w, x, y)
    except Exception:
        torch_tput = float("nan")
    vs = jax_tput / torch_tput if torch_tput == torch_tput else 0.0
    try:
        test_mse, test_mae = bench_accuracy_chickenpox()
    except Exception:
        test_mse = test_mae = None
    try:
        bcsr_eps, seg_eps, mfu, hbm_gbs = bench_kernel_edges()
    except Exception:
        bcsr_eps = seg_eps = mfu = hbm_gbs = None
    try:
        # reference-published target for this protocol: MSE 0.5264
        # (introduction.rst:378); None when bytes are not staged
        wiki_mse = bench_accuracy_wikimaths()
    except Exception:
        wiki_mse = None
    rec = {
        "metric": "dcrnn_metrla_train_snapshots_per_sec_per_chip",
        "value": round(jax_tput, 1),
        "unit": "snapshots/s",
        "vs_baseline": round(vs, 2),
        # `value` is device-only (slope method cancels this platform's fixed
        # ~25 ms remote-tunnel dispatch per execution); `value_rawwall`
        # includes that dispatch so the series stays comparable across
        # rounds and timing methodologies.  vs_baseline_rawwall is the
        # like-for-like wall-clock ratio against the torch-CPU baseline.
        "value_rawwall": round(jax_tput_raw, 1),
        "vs_baseline_rawwall": round(
            jax_tput_raw / torch_tput if torch_tput == torch_tput else 0.0, 2
        ),
        "final_loss": round(loss, 4),
        "compute_dtype": "bfloat16 (f32 master params)",
        "baseline_dtype": "float32 torch-CPU",
        "chickenpox_gconvgru_test_mse": (
            round(test_mse, 4) if test_mse is not None else None
        ),
        "chickenpox_gconvgru_test_mae": (
            round(test_mae, 4) if test_mae is not None else None
        ),
        "wikimaths_gconvgru_test_mse": (
            round(wiki_mse, 4) if wiki_mse is not None else None
        ),
        # why the field can be null: the reference's published-MSE dataset
        # is download-gated; staging wikivital_mathematics.json under
        # PGT_TPU_DATA makes the protocol run and fill the field.
        "wikimaths_source": (
            "staged" if wiki_mse is not None
            else "unavailable (download-gated; stage under PGT_TPU_DATA)"
        ),
    }
    try:
        from benchmarks.bundled_accuracy import (
            extra_bundled_accuracy,
            pedalme_accuracy,
            twitter_tennis_accuracy,
        )

        # BASELINE configs 2 and 4 on the REAL bundled bytes (no
        # downloads), plus the remaining two bundled real datasets
        for k, v in {**pedalme_accuracy(),
                     **twitter_tennis_accuracy(),
                     **extra_bundled_accuracy()}.items():
            rec[k] = round(v, 4)
    except Exception:
        pass
    if bcsr_eps is not None:
        rec["bcsr_edges_per_sec_50k_banded"] = round(bcsr_eps / 1e6, 1)
        rec["bcsr_vs_segment_path"] = round(bcsr_eps / seg_eps, 2)
        rec["bcsr_mxu_mfu_pct"] = round(mfu, 2)
        rec["bcsr_hbm_gbs"] = round(hbm_gbs, 1)
        rec["bcsr_hbm_pct_peak"] = round(hbm_gbs / 819.0 * 100.0, 1)
    try:
        dyn_eps = bench_dynamic_edges()
        rec["dynamic_bcsr_edges_per_sec"] = round(dyn_eps / 1e6, 1)
    except Exception:
        pass
    try:
        # model-level fwd+bwd+Adam at N=50k (kernel wins end-to-end)
        m_bcsr, m_seg = bench_model_train_large_n()
        rec["bcsr_model_train_edges_per_sec"] = round(m_bcsr / 1e6, 1)
        rec["bcsr_model_train_vs_segment"] = round(m_bcsr / m_seg, 2)
    except Exception:
        pass
    try:
        # kernel time recovered by the shortcut-filtered RCM pass when
        # caller node ids scramble a structurally-banded graph; a
        # nonsensical ratio means a timing glitch (the slope method's
        # delta drowned in tunnel noise) — re-measure once, else omit
        for _ in range(2):
            ro_plain, ro_rcm = bench_reorder_recovery()
            speedup = ro_plain / ro_rcm
            if 0.5 < speedup < 500.0:
                rec["bcsr_reorder_speedup_scrambled"] = round(speedup, 1)
                break
    except Exception:
        pass
    try:
        from benchmarks.metrla_protocol import run_parity

        par = run_parity(epochs=3, t_len=720)
        rec["metrla_test_mae_denorm"] = par["test_masked_mae_denorm"]
        rec["metrla_test_mae_denorm_torch"] = par[
            "test_masked_mae_denorm_torch"
        ]
        rec["metrla_mae_parity_pct"] = par["mae_parity_pct"]
        rec["metrla_parity_source"] = par["source"]
        # Which semantics the parity certifies (see metrla_protocol.py):
        # the paper-form DCRNN; `compat='reference'` is certified by
        # bit-level unit tests in tests/test_golden_models.py.
        rec["metrla_parity_semantics"] = "paper-form"
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
