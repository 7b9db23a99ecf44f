"""Parity tests for the fused Pallas masked-GRU-scan kernel
(ops/pallas/rnn_kernels.py) against the lax.scan reference path
(nn/rnn.py masked_update_stacked).

Runs the kernel in interpret mode on CPU (mode="always")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ignnition_tpu.frontend.ir import RNNSpec
from ignnition_tpu.nn import rnn
from ignnition_tpu.ops.pallas import rnn_kernels as rk


def _make_inputs(key, max_len, n_dst, d, u, dtype):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xs = jax.random.normal(k1, (max_len, n_dst, d), jnp.float32).astype(dtype)
    h0 = jax.random.normal(k2, (n_dst, u), jnp.float32).astype(dtype)
    lens = jax.random.randint(k3, (n_dst,), 0, max_len + 1, jnp.int32)
    # ensure the edge cases appear
    lens = lens.at[0].set(0)
    lens = lens.at[1].set(max_len)
    params = {
        "kernel": jax.random.normal(k4, (d, 3 * u), jnp.float32).astype(dtype),
        "recurrent_kernel": jax.random.normal(k5, (u, 3 * u), jnp.float32).astype(
            dtype
        ),
        "bias": jnp.zeros((2, 3 * u), dtype).at[0, :u].set(0.1).at[1, 2 * u :].set(
            -0.05
        ),
    }
    return xs, lens, h0, params


def _reference(xs, lens, h0, params):
    spec = RNNSpec(name="t", cell_type="GRU")
    rk.set_mode("never")
    try:
        return rnn.masked_update_stacked(spec, params, xs, lens, h0)
    finally:
        rk.set_mode("always")


@pytest.fixture(autouse=True)
def _force_kernel():
    rk.set_mode("always")
    yield
    rk.set_mode("never")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("max_len,n_dst,d,u", [(5, 256, 8, 8), (3, 512, 16, 8)])
def test_forward_parity(dtype, max_len, n_dst, d, u):
    xs, lens, h0, params = _make_inputs(
        jax.random.PRNGKey(0), max_len, n_dst, d, u, dtype
    )
    got = rk.masked_gru_scan(xs, lens, h0, params)
    want = _reference(xs, lens, h0, params)
    # bf16: the kernel carries h in f32 between steps (more accurate than the
    # all-bf16 fallback scan), so per-element divergence up to ~1 bf16 ulp of
    # the gate sums is expected.
    tol = 1e-5 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_grad_parity(dtype):
    max_len, n_dst, d, u = 4, 256, 8, 8
    xs, lens, h0, params = _make_inputs(
        jax.random.PRNGKey(1), max_len, n_dst, d, u, dtype
    )
    cot = jax.random.normal(jax.random.PRNGKey(2), (n_dst, u), jnp.float32)

    def loss_kernel(xs, h0, params):
        return jnp.sum(rk.masked_gru_scan(xs, lens, h0, params) * cot)

    def loss_ref(xs, h0, params):
        return jnp.sum(_reference(xs, lens, h0, params) * cot)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(xs, h0, params)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(xs, h0, params)
    flat_k, _ = jax.tree.flatten(g_k)
    flat_r, _ = jax.tree.flatten(g_r)
    assert len(flat_k) == len(flat_r)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            atol=2e-4,
            rtol=2e-4,
        )


def test_zero_length_rows_keep_state():
    max_len, n_dst, d, u = 3, 256, 8, 8
    xs, _, h0, params = _make_inputs(
        jax.random.PRNGKey(3), max_len, n_dst, d, u, jnp.float32
    )
    lens = jnp.zeros((n_dst,), jnp.int32)
    got = rk.masked_gru_scan(xs, lens, h0, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(h0), atol=1e-6)
