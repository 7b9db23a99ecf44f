"""Microbench: fused Pallas masked-GRU-scan vs lax.scan at flagship shapes."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")

import jax
import jax.numpy as jnp

from ignnition_tpu.frontend.ir import RNNSpec
from ignnition_tpu.nn import rnn
from ignnition_tpu.ops.pallas import rnn_kernels as rk


def timeit(f, *args, iters=30):
    out = f(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    out = f(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    base = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return max(time.time() - t0 - base, 1e-9) / (iters - 1)


def main():
    L, N, D, U = 8, 16384, 32, 32
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    xs = jax.random.normal(ks[0], (L, N, D), jnp.float32).astype(dtype)
    h0 = jax.random.normal(ks[1], (N, U), jnp.float32).astype(dtype)
    lens = jax.random.randint(ks[2], (N,), 0, L + 1, jnp.int32)
    params = {
        "kernel": jax.random.normal(ks[3], (D, 3 * U), jnp.float32).astype(dtype),
        "recurrent_kernel": jax.random.normal(ks[4], (U, 3 * U), jnp.float32).astype(dtype),
        "bias": jnp.zeros((2, 3 * U), dtype),
    }
    xs, h0, lens = jax.device_put((xs, h0, lens))
    params = jax.device_put(params)
    spec = RNNSpec(name="t", cell_type="GRU")

    rk.set_mode("always")
    kern_fwd = jax.jit(lambda xs, h0, p: rk.masked_gru_scan(xs, lens, h0, p))
    kern_grad = jax.jit(
        jax.grad(
            lambda xs, h0, p: jnp.sum(
                rk.masked_gru_scan(xs, lens, h0, p).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )
    )
    rk.set_mode("never")
    scan_fwd = jax.jit(
        lambda xs, h0, p: rnn.masked_update_stacked(spec, p, xs, lens, h0)
    )
    scan_grad = jax.jit(
        jax.grad(
            lambda xs, h0, p: jnp.sum(
                rnn.masked_update_stacked(spec, p, xs, lens, h0).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )
    )

    print(f"kernel fwd : {timeit(kern_fwd, xs, h0, params)*1e3:.3f} ms")
    print(f"scan   fwd : {timeit(scan_fwd, xs, h0, params)*1e3:.3f} ms")
    print(f"kernel grad: {timeit(kern_grad, xs, h0, params)*1e3:.3f} ms")
    print(f"scan   grad: {timeit(scan_grad, xs, h0, params)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
