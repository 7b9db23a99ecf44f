"""Calibrate the masked recurrent scan's empirical floor (VERDICT r4 #2).

Measures, in isolation, the full training cost (forward + backward via
jax.value_and_grad, matching the in-model usage in nn/rnn.py
masked_update_stacked with its remat body) of the SHIPPED masked GRU/LSTM
lax.scan at the model families' shapes, min-of-trials fetch-based timing
(bench.time_step conventions — `block_until_ready` does not block through
the tunnel).

Why the shipped scan and not a "pure traffic" bound: round 4's fused
Pallas masked-GRU kernel is ~8x faster in ISOLATION (fwd 0.115 ms vs
0.903 at [8, 16384, 32]) but a measured net LOSS in-model (flagship 12.1
-> 23.8 ms: XLA pins the kernel's [L, N, D] operands in scoped VMEM and
the adjacent slice-sort backward slows 6x — PERF.md 'Failed
experiments'). The best ACHIEVABLE per-scan cost on this hardware is
therefore the lax.scan path's isolated cost, the same
best-available-lowering convention the gather floor uses
(tools/exp_gather_floor.py).

Model: t_train(L, N, D) = a * (L*N*D) + b * L
  a = per-element cost (gate FLOPs + gate/state HBM round trips per
      element-step, fwd + remat-recomputed bwd)
  b = per-sequential-step overhead (scan step launch + state carry
      latency, fwd + bwd)

Fit by least squares over an (L, N) grid at D=32 (every shipped family's
state width) and checked at D=16/64. The fitted constants feed
utils/roofline.py HardwareSpec.rnn_scan_ps_per_elem / rnn_scan_us_per_step
(env IGNNITION_TPU_RNN_SCAN_PS / IGNNITION_TPU_RNN_SCAN_US).

Reference semantics being paid for: the masked Keras RNN over padded
per-destination sequences, auxilary_classes.py:767-796.

Usage: python -m tools.exp_rnn_floor [--cell GRU|LSTM] [--trials 5]
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_scan_train(cell, L, N, D, Din):
    from ignnition_tpu.frontend.ir import RNNSpec
    from ignnition_tpu.nn import rnn

    spec = RNNSpec(name="cal", cell_type=cell)
    rng = np.random.default_rng(0)
    params = rnn.init(jax.random.PRNGKey(0), spec, Din, D)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params
    )
    xs = jnp.asarray(rng.standard_normal((L, N, Din)), jnp.bfloat16)
    lengths = jnp.asarray(rng.integers(1, L + 1, N), jnp.int32)
    h0 = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)

    def loss(p, xs, h0):
        out = rnn.masked_update_stacked(spec, p, xs, lengths, h0)
        return jnp.sum(out.astype(jnp.float32))

    M = 20  # repeated train steps INSIDE one jit: tiny kernels (tens of µs)
    # otherwise measure host dispatch throughput, not device time — the
    # fwd+bwd repeats chain through h0 <- d(loss)/d(h0)

    @jax.jit
    def step(p, xs, h0):
        def body(h, _):
            l, (gp, gx, gh) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                p, xs, h
            )
            return gh.astype(h.dtype), l
        h, ls = jax.lax.scan(body, h0, None, length=M)
        return jnp.sum(ls)

    step.M = M
    return step, params, xs, h0


def time_scan(step, params, xs, h0, trials=5, target_s=0.05):
    """Fetch-based per-train-step time: each jitted call runs step.M chained
    fwd+bwd repeats on device, so per-call dispatch amortizes over M. Min
    over trials (additive tunnel noise only ever inflates); outer iters
    adapt so total device work >= target_s."""
    float(step(params, xs, h0))  # compile + fetch

    def trial(iters):
        t0 = time.time()
        float(step(params, xs, h0))
        base = time.time() - t0
        t0 = time.time()
        acc = None
        for _ in range(iters):
            acc = step(params, xs, h0)
        float(acc)
        return max(time.time() - t0 - base, 1e-9) / (iters - 1) / step.M

    est = trial(5) * step.M
    iters = int(min(max(target_s / max(est, 1e-7), 5), 300))
    return min(trial(iters) for _ in range(trials))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="GRU")
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    # (L, N) grid at the shipped widths: flagship stage1 is (8, 16384),
    # qsize's interleave scan is (8..16, 16384); N variation separates the
    # per-element from the per-step term
    grid = [
        (4, 16384), (8, 16384), (16, 16384), (32, 16384),
        (8, 4096), (16, 4096), (8, 2048),
    ]
    D = 32
    rows = []
    for L, N in grid:
        step, params, xs, h0 = build_scan_train(args.cell, L, N, D, D)
        dt = time_scan(step, params, xs, h0, trials=args.trials)
        rows.append((L, N, dt))
        print(f"L={L:3d} N={N:6d} D={D}: {dt*1e3:8.4f} ms "
              f"({dt/L*1e6:7.2f} us/step, {dt/(L*N*D)*1e12:6.2f} ps/elem)",
              flush=True)

    # least squares t = a*(L*N*D) + b*L
    A = np.array([[L * N * D, L] for L, N, _ in rows], float)
    y = np.array([dt for _, _, dt in rows], float)
    (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"\nfit: t = a*elems + b*steps")
    print(f"  a = {a*1e12:.3f} ps/elem   b = {b*1e6:.2f} us/step")
    resid = A @ np.array([a, b]) - y
    rel = np.abs(resid) / np.maximum(y, 1e-9)
    print(f"  max fit error: {np.abs(resid).max()*1e3:.4f} ms "
          f"({100*rel.max():.1f}%)")

    # width check at D=16/64 (a is charged per ELEMENT = L*N*D)
    for Dc in (16, 64):
        L, N = 8, 16384
        step, params, xs, h0 = build_scan_train(args.cell, L, N, Dc, Dc)
        dt = time_scan(step, params, xs, h0, trials=args.trials)
        pred = a * L * N * Dc + b * L
        print(f"check D={Dc}: measured {dt*1e3:.4f} ms vs model "
              f"{pred*1e3:.4f} ms ({dt/pred:.2f}x)")

    print(f"\nexport IGNNITION_TPU_RNN_SCAN_PS={a*1e12:.3f}")
    print(f"export IGNNITION_TPU_RNN_SCAN_US={b*1e6:.2f}")


if __name__ == "__main__":
    main()
