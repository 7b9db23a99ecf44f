"""Flash-style Pallas kernels for the dense GAT attention aggregation.

The XLA dense path (ops/segment.py `_dense_masked_softmax_matmul`) must
materialize the [n_dst, n_src] attention matrix in HBM for its matmuls —
~64 MB bf16 per MP iteration at flagship scale, several round trips per
step even after the round-4 matmul-factored backward. These kernels stream
the incidence matrix ONCE per pass and keep every [TD, TS] score/attention
tile in VMEM (flash-attention structure, adapted to GATv1 scores over a
multiplicity-weighted support):

  forward:  for each dst tile, accumulate  z @ [x | 1]  over src tiles
            (z = m * exp(LeakyReLU(sdst+ssrc) - stab) computed in-register),
            then divide by the ones-column denominator. HBM traffic = one
            read of m (+ the small vectors/tables). The denominator is
            emitted for the backward.
  backward: one more pass over m recomputes each attention tile from the
            saved denominator and accumulates, all in VMEM residents:
              d_table[s] += sum_i a[i,s] ct[i]          (MXU, per tile)
              d_ssrc[s]  += sum_i w[i,s](da[i,s]-srow[i])
              d_sdst[i]  += sum_s w[i,s](da[i,s]-srow[i])
            with da = ct @ x^T computed on the MXU per tile and
            w = a * LeakyReLU'(pre). srow rides the saved forward output
            (sum_s dA*A = ct.out — the flash softmax-VJP row statistic).

Stabilization uses the PER-ROW score bound lrelu(sdst[d] + max ssrc)
(monotonicity — computable from the per-node score vectors alone, no pass
over the matrix): exact in the sdst spread, and only an ssrc spread past
the ~88-nat exp budget can underflow a row — the same exposure class
`sorted_segment_softmax` documents as exact for GAT score ranges;
exp(e - stab) <= 1 never overflows.

Constraints: n_dst divisible by 8 and n_src by 128 (tile split picks the
largest legal [TD, TS]); callers fall back to the XLA dense path otherwise
(ops/segment.py dispatch, loud on unexpected lowering failures).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.2  # LeakyReLU negative slope (reference a_c.py GAT scores)


def _pick(n, cands):
    for c in cands:
        if n % c == 0:
            return c
    return None


def pick_tiles(n_dst: int, n_src: int, dtype=None):
    """Preferred legal [TD, TS] split, or None if the shape is ineligible.

    Tuned on v5e at [2048, 16384] (min-of-trials, isolated fwd+bwd per
    iteration, bf16): (512, 2048) 0.33 ms < (512, 1024) 0.40 <
    (256, 1024) 0.74 — bigger dst tiles amortize the per-tile MXU setup
    of the backward's D=32 contractions, bigger src tiles its accumulator
    slicing. f32 keeps the smaller (256, 1024) split: the f32 backward's
    per-tile intermediates at (512, 2048) exceed scoped VMEM by a hair
    (16.02M vs the 16M limit)."""
    if dtype is not None and jnp.dtype(dtype) == jnp.float32:
        td = _pick(n_dst, (256, 128, 64, 32, 16, 8))
        ts = _pick(n_src, (1024, 512, 256, 128))
    else:
        td = _pick(n_dst, (512, 256, 128, 64, 32, 16, 8))
        ts = _pick(n_src, (2048, 1024, 512, 256, 128))
    return None if td is None or ts is None else (td, ts)


def _tile_z(sdst_t, ssrc_t, m_t, stab_t):
    """z = m * exp(lrelu(sdst+ssrc) - stab) for one [TD, TS] tile, f32.

    The kernels are VPU-bound on this chain (33.5M entries x 15 passes at
    flagship scale), so it is kept minimal: stab is the PER-ROW bound
    lrelu(sdst + max ssrc) >= every e in the row (so the sdst spread can
    never underflow a row — only an >~88-nat ssrc spread can, the exposure
    class sorted_segment_softmax documents as exact for GAT ranges), hence
    exp(e - stab) <= 1 — finite — and the absent-edge mask needs no
    select, the m multiply alone zeroes it (no inf * 0 hazard)."""
    pre = sdst_t + ssrc_t  # (TD,1)+(1,TS) broadcast
    e = jnp.maximum(pre, _SLOPE * pre)  # lrelu, branch-free (slope < 1)
    return jnp.exp(e - stab_t) * m_t.astype(jnp.float32), pre


def _prec(dtype):
    """The repo's dense-path precision policy (ops/segment._dot): f32
    matmuls run HIGHEST (v5e lowers DEFAULT f32 dots to bf16 passes),
    bf16 runs a single DEFAULT pass."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _fwd_kernel(stab_ref, sdst_ref, ssrc_ref, xe_ref, m_ref,
                out_ref, den_ref, acc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    z, _ = _tile_z(sdst_ref[:, :], ssrc_ref[:, :], m_ref[:, :],
                   stab_ref[:, :])
    acc[:, :] += jax.lax.dot_general(
        z.astype(xe_ref.dtype), xe_ref[:, :],
        (((1,), (0,)), ((), ())),
        precision=_prec(xe_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        den = acc[:, -1:]
        out_ref[:, :] = (
            acc[:, :-1] / jnp.maximum(den, 1e-30)
        ).astype(out_ref.dtype)
        den_ref[:, :] = den


@functools.partial(jax.jit, static_argnames=("td", "ts", "interpret"))
def flash_gat_forward(ssrc, sdst, x, m, stab, td, ts, interpret=False):
    """(out [n_dst, D], den [n_dst, 1] f32). `stab` is the [n_dst] per-row
    score bound (segment.py _flash_stab)."""
    n_dst, n_src = m.shape
    d = x.shape[1]
    xe = jnp.concatenate([x, jnp.ones((n_src, 1), x.dtype)], axis=1)
    grid = (n_dst // td, n_src // ts)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, ts), lambda i, j: (0, j)),
            pl.BlockSpec((ts, d + 1), lambda i, j: (j, 0)),
            pl.BlockSpec((td, ts), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((td, d), lambda i, j: (i, 0)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_dst, d), x.dtype),
            jax.ShapeDtypeStruct((n_dst, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((td, d + 1), jnp.float32)],
    )(stab.reshape(-1, 1).astype(jnp.float32),
      sdst.reshape(-1, 1).astype(jnp.float32),
      ssrc.reshape(1, -1).astype(jnp.float32), xe, m)


def _bwd_kernel(stab_ref, sdst_ref, ssrc_ref, x_ref, m_ref, den_ref,
                ct_ref, srow_ref, dtab_ref, dsdst_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ts = x_ref.shape[0]

    @pl.when((i == 0) & (j == 0))
    def _():
        dtab_ref[:, :] = jnp.zeros_like(dtab_ref)

    @pl.when(j == 0)
    def _():
        dsdst_ref[:, :] = jnp.zeros_like(dsdst_ref)

    z, pre = _tile_z(sdst_ref[:, :], ssrc_ref[:, :], m_ref[:, :],
                     stab_ref[:, :])
    a = z / jnp.maximum(den_ref[:, :], 1e-30)  # (TD, TS) f32
    ab = a.astype(ct_ref.dtype)
    ct = ct_ref[:, :]
    xt = x_ref[:, :]
    # da[i, s] = ct[i] . x[s] — per-tile on the MXU, never in HBM
    da = jax.lax.dot_general(
        ct, xt, (((1,), (1,)), ((), ())),
        precision=_prec(xt.dtype),
        preferred_element_type=jnp.float32,
    )
    w = a * jnp.where(pre > 0, 1.0, _SLOPE)
    dp = w * (da - srow_ref[:, :])
    # d_table rows for this src tile (+ the d_ssrc column): contract the
    # dst-tile axis of both on the MXU
    dtab_tile = jax.lax.dot_general(
        ab, ct, (((0,), (0,)), ((), ())),
        precision=_prec(xt.dtype),
        preferred_element_type=jnp.float32,
    )  # (TS, D)
    dssrc_tile = jnp.sum(dp, axis=0)[:, None]  # (TS, 1)
    base = pl.multiple_of(j * ts, ts)
    dtab_ref[pl.ds(base, ts), :] += jnp.concatenate(
        [dtab_tile, dssrc_tile], axis=1
    )
    dsdst_ref[:, :] += jnp.sum(dp, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("td", "ts", "interpret"))
def flash_gat_backward(ssrc, sdst, x, m, stab, den, ct, srow, td, ts,
                       interpret=False):
    """(dtab_plus [n_src, D+1] f32 — [:, :D] = d_table, [:, D] = d_ssrc —
    and d_sdst [n_dst, 1] f32)."""
    n_dst, n_src = m.shape
    d = x.shape[1]
    grid = (n_dst // td, n_src // ts)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, ts), lambda i, j: (0, j)),
            pl.BlockSpec((ts, d), lambda i, j: (j, 0)),
            pl.BlockSpec((td, ts), lambda i, j: (i, j)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((td, d), lambda i, j: (i, 0)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_src, d + 1), lambda i, j: (0, 0)),
            pl.BlockSpec((td, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_src, d + 1), jnp.float32),
            jax.ShapeDtypeStruct((n_dst, 1), jnp.float32),
        ],
    )(stab.reshape(-1, 1).astype(jnp.float32),
      sdst.reshape(-1, 1).astype(jnp.float32),
      ssrc.reshape(1, -1).astype(jnp.float32), x, m, den,
      ct.astype(x.dtype), srow)
