"""Calibrate the sorted (packed Pallas) segment-sum's per-row floor
(r5, the mlp_message bound revision).

Every slice/slot-layout transpose ends in one sorted segment sum per
iteration (the backward of the slice gather: cotangents re-sorted to
source order, then summed per source row). The roofline's gather
convention counted that pass's rows at the GATHER descriptor constant;
this measures the actual best-available kernel (ops/segment.py packed
Pallas path — 3.0x over XLA scatter, PERF.md 'Kernel microbenchmarks')
in isolation at the shipped shapes, min-of-trials, chained in-jit like
tools/exp_rnn_floor.py.

The floor is granularity-bound, not bandwidth-bound: the packed kernel
reads 4-edge packed rows through 8-sublane tiles (the smallest
Mosaic-issuable unit, tools/exp_gather_floor.py), so per-row cost is flat
in D (like the gather's descriptor cost).

Usage: python -m tools.exp_segsum_floor
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(E, n_seg, D, dtype, M=20):
    from ignnition_tpu.ops import segment as seg

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((E, D)), dtype)
    # uniform sorted segments
    per = E // n_seg
    ids = jnp.asarray(np.repeat(np.arange(n_seg), per), jnp.int32)
    rp = jnp.asarray(np.arange(0, E + 1, per), jnp.int32)

    @jax.jit
    def step(d):
        def body(acc, _):
            # loop-variant row_ptr (a zero derived from the carry) prevents
            # XLA from hoisting the invariant kernel call; the int add over
            # [n_seg+1] is negligible next to the kernel
            zero = (acc[0, 0] * 0).astype(jnp.int32)
            out = seg.segment_sum(
                d, ids, n_seg,
                indices_are_sorted=True, use_pallas="always",
                row_ptr=rp + zero,
            )
            return out, ()
        out, _ = jax.lax.scan(body, jnp.zeros((n_seg, D), jnp.float32),
                              None, length=M)
        return jnp.sum(out)

    step.M = M
    return step, data


def time_it(step, data, trials=5, target_s=0.05):
    float(step(data))

    def trial(iters):
        t0 = time.time()
        float(step(data))
        base = time.time() - t0
        t0 = time.time()
        acc = None
        for _ in range(iters):
            acc = step(data)
        float(acc)
        return max(time.time() - t0 - base, 1e-9) / (iters - 1) / step.M

    est = trial(5) * step.M
    iters = int(min(max(target_s / max(est, 1e-7), 5), 300))
    return min(trial(iters) for _ in range(trials))


def main():
    shapes = [
        # (E, n_seg, D) at the shipped family shapes
        (131072, 16384, 32),   # flagship stage1 transpose
        (131072, 2048, 32),    # mlp_message stage2 transpose
        (262144, 16384, 32),
        (131072, 16384, 32),
    ]
    best = []
    for i, (E, n_seg, D) in enumerate(shapes):
        for dtype in (jnp.float32, jnp.bfloat16):
            step, data = build(E, n_seg, D, dtype)
            dt = time_it(step, data)
            ns = dt / E * 1e9
            print(f"E={E:7d} segs={n_seg:6d} D={D} {dtype.__name__:8}: "
                  f"{dt*1e3:7.4f} ms ({ns:5.2f} ns/row)", flush=True)
            best.append(ns)
    print(f"\nmin observed: {min(best):.2f} ns/row")
    print(f"export IGNNITION_TPU_SEGSUM_NS={min(best):.2f}")


if __name__ == "__main__":
    main()
