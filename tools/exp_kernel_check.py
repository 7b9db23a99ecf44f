"""TPU numeric check: packed kernel (bf16 native, zero-copy, real-edge CSR)
vs XLA reference, with padding edges present; then micro-timing."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ignnition_tpu.ops import segment as seg
from ignnition_tpu.ops.pallas.segment_kernels import sorted_segment_sum_csr


def main():
    rng = np.random.default_rng(0)
    E_real, E_pad, N_dst, N_src, D = 130000, 131072, 16384, 2048, 32

    dst = np.sort(rng.integers(0, N_dst - 1, E_real)).astype(np.int32)
    dst_full = np.concatenate([dst, np.full(E_pad - E_real, N_dst - 1, np.int32)])
    src_full = np.concatenate(
        [rng.integers(0, N_src, E_real).astype(np.int32),
         np.full(E_pad - E_real, N_src - 1, np.int32)]
    )
    emask = np.zeros(E_pad, np.float32)
    emask[:E_real] = 1.0
    row_ptr = np.searchsorted(dst_full[:E_real], np.arange(N_dst + 1)).astype(np.int32)

    data_f32 = rng.standard_normal((E_pad, D)).astype(np.float32)
    ref = np.zeros((N_dst, D), np.float32)
    np.add.at(ref, dst_full[:E_real], data_f32[:E_real])

    for dt, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
        data = jnp.asarray(data_f32, dt)
        out = jax.jit(
            lambda x: sorted_segment_sum_csr(
                x, jnp.asarray(dst_full), jnp.asarray(row_ptr), N_dst
            )
        )(data)
        out = np.asarray(out, np.float32)
        ref_dt = ref if dt == jnp.float32 else np.zeros((N_dst, D), np.float32)
        if dt == jnp.bfloat16:
            d16 = np.asarray(jnp.asarray(data_f32, jnp.bfloat16), np.float32)
            np.add.at(ref_dt, dst_full[:E_real], d16[:E_real])
        err = np.abs(out - ref_dt).max() / (np.abs(ref_dt).max() + 1e-9)
        print(f"packed kernel {np.dtype(dt).name}: rel err {err:.2e} {'OK' if err < tol else 'FAIL'}")

    # direct_segment_sum fwd+bwd vs masked XLA reference (bf16)
    states = jnp.asarray(rng.standard_normal((N_src, D)), jnp.bfloat16)
    perm = np.argsort(src_full, kind="stable").astype(np.int32)
    src_sorted = src_full[perm]
    src_row_ptr = np.searchsorted(src_sorted[:E_real], np.arange(N_src + 1)).astype(np.int32)
    args = dict(
        src_idx=jnp.asarray(src_full),
        dst_idx=jnp.asarray(dst_full),
        emask=jnp.asarray(emask),
        row_ptr=jnp.asarray(row_ptr),
        dst_in_src_order=jnp.asarray(dst_full[perm]),
        emask_src_order=jnp.asarray(emask[perm]),
        src_sorted=jnp.asarray(src_sorted),
        src_row_ptr=jnp.asarray(src_row_ptr),
    )

    def f(s):
        out = seg.direct_segment_sum(
            s, args["src_idx"], args["dst_idx"], args["emask"], args["row_ptr"],
            args["dst_in_src_order"], args["emask_src_order"], args["src_sorted"],
            args["src_row_ptr"], N_dst, N_src,
        )
        w = jnp.arange(N_dst, dtype=jnp.float32)[:, None]
        return (out.astype(jnp.float32) * w).sum()

    def f_ref(s):
        m = s[args["src_idx"]] * args["emask"][:, None].astype(s.dtype)
        out = jax.ops.segment_sum(m.astype(jnp.float32), args["dst_idx"], N_dst)
        w = jnp.arange(N_dst, dtype=jnp.float32)[:, None]
        return (out * w).sum()

    v, g = jax.jit(jax.value_and_grad(f))(states)
    vr, gr = jax.jit(jax.value_and_grad(f_ref))(states)
    g, gr = np.asarray(g, np.float32), np.asarray(gr, np.float32)
    verr = abs(float(v) - float(vr)) / (abs(float(vr)) + 1e-9)
    gerr = np.abs(g - gr).max() / (np.abs(gr).max() + 1e-9)
    print(f"direct_segment_sum bf16: val rel err {verr:.2e}, grad rel err {gerr:.2e}")

    # timing: packed kernel bf16 vs f32
    for dt in (jnp.float32, jnp.bfloat16):
        data = jnp.asarray(data_f32, dt)
        fn = jax.jit(
            lambda x: sorted_segment_sum_csr(
                x, jnp.asarray(dst_full), jnp.asarray(row_ptr), N_dst
            ).sum()
        )
        float(fn(data))
        t0 = time.time(); float(fn(data)); t1 = time.time() - t0
        t0 = time.time()
        for _ in range(60):
            out = fn(data)
        float(out)
        tn = (time.time() - t0 - t1) / 59
        print(f"packed kernel {np.dtype(dt).name}: {tn*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
