"""Probe: can Mosaic do dynamic row gathers from a VMEM-resident table?

Tries jnp.take / indexing inside a Pallas kernel; falls back to reporting
the error. Also times a one-hot matmul gather kernel for comparison with
XLA's native gather at flagship shapes.
"""

import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, M = 2048, 32, 131072
TILE_M = 512


def take_kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]  # [TILE_M] int32? needs 2D...
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:, 0], axis=0)


def try_take(table, idx):
    return pl.pallas_call(
        take_kernel,
        grid=(M // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), table.dtype),
    )(idx.reshape(M, 1), table)


def onehot_kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]  # [TILE_M, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, N), 1)
    onehot = jnp.where(cols == idx, 1.0, 0.0)
    out_ref[:] = jax.lax.dot_general(
        onehot,
        table_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def onehot_gather(table, idx):
    return pl.pallas_call(
        onehot_kernel,
        grid=(M // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), table.dtype),
    )(idx.reshape(M, 1), table)


def timeit(fn, *args, iters=60):
    fn = jax.jit(fn)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return max(time.time() - t0 - t1, 1e-9) / (iters - 1)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    ref = np.asarray(table)[np.asarray(idx)]

    try:
        out = jax.jit(lambda t, i: try_take(t, i))(table, idx)
        ok = np.array_equal(np.asarray(out), ref)
        t = timeit(lambda t_, i: try_take(t_, i).astype(jnp.float32).sum(), table, idx)
        print(f"pallas jnp.take gather: OK={ok}  {t*1e3:6.3f} ms")
    except Exception as e:
        print(f"pallas jnp.take gather: FAILED ({str(e)[:200]})")

    try:
        out = jax.jit(lambda t, i: onehot_gather(t, i))(table, idx)
        ok = np.array_equal(np.asarray(out), ref)
        t = timeit(lambda t_, i: onehot_gather(t_, i).astype(jnp.float32).sum(), table, idx)
        print(f"pallas one-hot gather:  OK={ok}  {t*1e3:6.3f} ms")
    except Exception as e:
        print(f"pallas one-hot gather:  FAILED ({str(e)[:200]})")

    t = timeit(lambda t_, i: t_[i].astype(jnp.float32).sum(), table, idx)
    print(f"XLA native gather:            {t*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
