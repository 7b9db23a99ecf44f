"""Flash-GAT Pallas kernels (ops/pallas/attention_kernels.py) vs the XLA
dense attention path — interpret-mode on CPU (the real lowering is bench /
TPU-verified; tests/test_dense_inc.py covers the XLA path itself)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ignnition_tpu.ops import segment as seg
from ignnition_tpu.ops.pallas.attention_kernels import (
    flash_gat_backward, flash_gat_forward, pick_tiles,
)


def _case(n_dst, n_src, d=16, seed=0, density=0.05, empty_first_row=True):
    rng = np.random.default_rng(seed)
    m = (rng.random((n_dst, n_src)) < density).astype(np.float32)
    m *= rng.integers(1, 4, (n_dst, n_src))  # multiplicities up to 3
    if empty_first_row:
        m[0] = 0.0  # an isolated destination: out must be exactly 0
    m = jnp.asarray(m, jnp.bfloat16)
    ssrc = jnp.asarray(rng.standard_normal(n_src), jnp.float32)
    sdst = jnp.asarray(rng.standard_normal(n_dst), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n_src, d)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((n_dst, d)), jnp.float32)
    return ssrc, sdst, x, m, ct


@pytest.mark.parametrize("shape", [(64, 256), (40, 384), (8, 128)])
def test_forward_matches_dense_path(shape):
    ssrc, sdst, x, m, ct = _case(*shape)
    td, ts = pick_tiles(*m.shape)
    stab = seg._flash_stab(ssrc, sdst)
    out, den = flash_gat_forward(ssrc, sdst, x, m, stab, td=td, ts=ts,
                                 interpret=True)
    ref = seg._dense_masked_softmax_matmul(ssrc, sdst, x, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the isolated destination aggregates to exactly zero
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    # den is the softmax denominator in the stab frame: rows with support
    # are strictly positive
    assert float(jnp.min(den[1:])) > 0.0


@pytest.mark.parametrize("shape", [(64, 256), (40, 384)])
def test_backward_matches_dense_path_grads(shape):
    ssrc, sdst, x, m, ct = _case(*shape, seed=3)
    td, ts = pick_tiles(*m.shape)
    stab = seg._flash_stab(ssrc, sdst)
    out, den = flash_gat_forward(ssrc, sdst, x, m, stab, td=td, ts=ts,
                                 interpret=True)
    srow = jnp.sum(ct * out.astype(jnp.float32), axis=1, keepdims=True)
    dtab_plus, dsdst = flash_gat_backward(
        ssrc, sdst, x, m, stab, den, ct, srow, td=td, ts=ts, interpret=True
    )

    def loss(ssrc, sdst, x):
        return jnp.sum(seg._dense_masked_softmax_matmul(ssrc, sdst, x, m) * ct)

    g_ssrc, g_sdst, g_x = jax.grad(loss, argnums=(0, 1, 2))(ssrc, sdst, x)
    np.testing.assert_allclose(np.asarray(dtab_plus[:, :-1]),
                               np.asarray(g_x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dtab_plus[:, -1]),
                               np.asarray(g_ssrc), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dsdst[:, 0]),
                               np.asarray(g_sdst), rtol=2e-4, atol=2e-5)


def test_score_outliers_do_not_underflow_rows():
    """Regression (round-4 review): a +60-nat sdst outlier on ONE row plus a
    +60-nat ssrc outlier outside another row's support used to push a
    GLOBAL stab bound past the exp budget and zero that row's output; the
    per-row bound lrelu(sdst[d] + max ssrc) keeps every row exact vs the
    per-row-max XLA dense path."""
    rng = np.random.default_rng(11)
    n_dst, n_src, d = 16, 128, 8
    m = np.zeros((n_dst, n_src), np.float32)
    # row 0 connects only to low-score sources; row 1 owns the outliers
    m[0, 1:9] = 1.0
    m[1, 0] = 1.0
    for i in range(2, n_dst):
        m[i, rng.integers(1, n_src, 6)] = 1.0
    m = jnp.asarray(m, jnp.bfloat16)
    ssrc = np.asarray(rng.standard_normal(n_src), np.float32)
    ssrc[0] = 60.0  # outlier source, only in row 1's support
    sdst = np.asarray(rng.standard_normal(n_dst), np.float32)
    sdst[1] = 60.0  # outlier destination
    ssrc, sdst = jnp.asarray(ssrc), jnp.asarray(sdst)
    x = jnp.asarray(rng.standard_normal((n_src, d)), jnp.float32)

    td, ts = pick_tiles(n_dst, n_src)
    stab = seg._flash_stab(ssrc, sdst)
    out, den = flash_gat_forward(ssrc, sdst, x, m, stab, td=td, ts=ts,
                                 interpret=True)
    ref = seg._dense_masked_softmax_matmul(ssrc, sdst, x, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.min(den)) > 0.0  # no row underflowed to zero support


def test_pick_tiles():
    assert pick_tiles(2048, 16384) == (512, 2048)
    assert pick_tiles(40, 384) == (8, 128)
    assert pick_tiles(7, 256) is None  # dst not divisible by 8
    assert pick_tiles(64, 100) is None  # src not divisible by 128


def test_dispatch_gates():
    """_use_flash_attn: off-TPU and small/ineligible shapes fall back."""
    m_small = jnp.zeros((64, 256), jnp.bfloat16)
    assert not seg._use_flash_attn(m_small)  # CPU (and below min entries)


def test_blocks_flash_matches_blocks_path():
    """The vmapped blocks flash kernels (opt-in, kept for A/B) match the
    XLA blocks path for values and gradients."""
    rng = np.random.default_rng(7)
    g, bd, bs, d = 3, 16, 128, 8
    m = (rng.random((g, bd, bs)) < 0.08).astype(np.float32)
    m *= rng.integers(1, 3, (g, bd, bs))
    m = jnp.asarray(m, jnp.bfloat16)
    ssrc = jnp.asarray(rng.standard_normal(g * bs), jnp.float32)
    sdst = jnp.asarray(rng.standard_normal(g * bd), jnp.float32)
    x = jnp.asarray(rng.standard_normal((g * bs, d)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((g * bd, d)), jnp.float32)

    # interpret mode on CPU: patch the kernel entry points
    import functools
    import ignnition_tpu.ops.pallas.attention_kernels as ak

    orig_f, orig_b = ak.flash_gat_forward, ak.flash_gat_backward
    ak_fwd = functools.partial(orig_f.__wrapped__, interpret=True)
    ak_bwd = functools.partial(orig_b.__wrapped__, interpret=True)
    try:
        ak.flash_gat_forward = ak_fwd
        ak.flash_gat_backward = ak_bwd

        def l_ref(*a):
            return jnp.sum(seg._blocks_masked_softmax_matmul(*a, m) * ct)

        def l_flash(*a):
            return jnp.sum(seg._flash_blocks_masked_softmax_matmul(*a, m) * ct)

        np.testing.assert_allclose(
            float(l_flash(ssrc, sdst, x)), float(l_ref(ssrc, sdst, x)),
            rtol=1e-5,
        )
        g1 = jax.grad(l_ref, argnums=(0, 1, 2))(ssrc, sdst, x)
        g2 = jax.grad(l_flash, argnums=(0, 1, 2))(ssrc, sdst, x)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)
    finally:
        ak.flash_gat_forward = orig_f
        ak.flash_gat_backward = orig_b


def test_factored_backward_adds_no_bf16_error():
    """Round-4 review concern: the factored backward's difference-of-
    near-equal-matmuls form could amplify bf16 quantization where the
    legacy elementwise (da - s_row) form would not. Measured: the two are
    EQUAL to ~1e-3 relative in bf16 even in the worst (near-uniform
    attention) regime — the bf16 error both share comes from the quantized
    score inputs upstream, not the backward's algebra."""
    import os

    rng = np.random.default_rng(2)
    n_dst, n_src, d = 64, 256, 16
    m = jnp.asarray(
        (rng.random((n_dst, n_src)) < 0.05).astype(np.float32), jnp.bfloat16
    )
    # near-uniform: tiny scores make (da - s_row) maximally cancellation-prone
    ssrc = jnp.asarray(0.01 * rng.standard_normal(n_src), jnp.bfloat16)
    sdst = jnp.asarray(0.01 * rng.standard_normal(n_dst), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((n_src, d)), jnp.bfloat16)
    ct = jnp.asarray(rng.standard_normal((n_dst, d)), jnp.float32)

    def grads(a, b, c):
        return jax.grad(
            lambda s1, s2, xx: jnp.sum(
                seg._dense_masked_softmax_matmul(s1, s2, xx, m).astype(
                    jnp.float32
                ) * ct
            ),
            argnums=(0, 1, 2),
        )(a, b, c)

    g_fac = grads(ssrc, sdst, x)
    os.environ["IGNNITION_TPU_DENSE_ATTN_BWD"] = "legacy"
    try:
        g_leg = grads(ssrc, sdst, x)
    finally:
        del os.environ["IGNNITION_TPU_DENSE_ATTN_BWD"]
    for a, b in zip(g_fac, g_leg):
        af, bf = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(bf).max(), 1e-9)
        # within a couple of bf16 output ulps — NOT the orders-of-magnitude
        # amplification the cancellation scenario predicted
        assert np.abs(af - bf).max() / scale < 6e-3


def test_legacy_and_factored_backward_agree():
    """The round-4 matmul-factored XLA backward equals the materializing
    legacy backward (IGNNITION_TPU_DENSE_ATTN_BWD=legacy A/B toggle)."""
    ssrc, sdst, x, m, ct = _case(48, 256, seed=5)

    def loss(ssrc, sdst, x):
        return jnp.sum(seg._dense_masked_softmax_matmul(ssrc, sdst, x, m) * ct)

    g_new = jax.grad(loss, argnums=(0, 1, 2))(ssrc, sdst, x)
    res = (ssrc, sdst, x, m)
    ct_full = jnp.asarray(np.asarray(ct), jnp.float32)
    g_leg = seg._dmsm_bwd_legacy(res, ct_full)
    for a, b in zip(g_new, g_leg[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
