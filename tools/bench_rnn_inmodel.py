"""Localize the in-model fused-GRU-kernel regression: time the full train
step with the kernel on vs off (separate jitted function objects — jax
caches traces per function object, so a shared one would not retrace)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")

import jax
import jax.numpy as jnp

import bench
from ignnition_tpu.ops.pallas import rnn_kernels as rk


def timeit(f, *args, iters=30):
    out = f(*args)
    float(jax.tree.leaves(out)[-1].astype(jnp.float32))
    t0 = time.time()
    out = f(*args)
    float(jax.tree.leaves(out)[-1].astype(jnp.float32))
    base = time.time() - t0
    t0 = time.time()
    p, o, _ = out if isinstance(out, tuple) else (None, None, None)
    for _ in range(iters):
        out = f(*args)
    float(jax.tree.leaves(out)[-1].astype(jnp.float32))
    return max(time.time() - t0 - base, 1e-9) / (iters - 1)


def main():
    make_step, params, opt_state, arrays, edges = bench.build_case()
    arrays = jax.device_put(arrays)
    step = make_step(jnp.bfloat16)

    for mode in ("always", "never"):
        rk.set_mode(mode)

        def mk():
            def f(p, o, b):
                return step(p, o, b)

            return f

        f = jax.jit(mk())
        dt = timeit(f, params, opt_state, arrays, iters=30)
        print(f"train step kernel={mode}: {dt*1e3:.3f} ms")
    rk.set_mode("auto")


if __name__ == "__main__":
    main()
