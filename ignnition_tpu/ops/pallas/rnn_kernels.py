"""Pallas TPU kernel for the masked GRU scan of the ordered update.

The reference's sorted recurrent update (auxilary_classes.py:767-796) runs a
masked Keras RNN over the padded per-destination message sequences. Lowered
through lax.scan, each time step is a separate XLA fusion: the forward stacks
every carry into HBM via dynamic-update-slices, and the backward (even under
jax.checkpoint remat) pays per-step dynamic-slice reads, gate recompute
fusions, and a d_xs dynamic-update-slice — measured at ~2.5 ms of a 12 ms
flagship training step (PERF.md step anatomy).

This kernel runs the whole masked scan in one pass per destination tile:

  * grid over destination tiles; the tile's full time block
    xs[:, tile, :] ([L, TILE_P, D]) arrives in VMEM;
  * the L GRU steps run in-register — no carry stacking, no per-step HBM
    round trips; gate matmuls hit the MXU back-to-back;
  * the backward kernel recomputes the forward in VMEM scratch (the inputs
    are already resident — recompute is cheaper than stacking residuals),
    then walks time in reverse, writing d_xs blocks and accumulating the
    weight/bias gradients into constant-index output blocks.

The time-slice GATHER deliberately stays OUTSIDE this kernel: XLA's row
gather runs at ~2 ns/row (descriptor-bound), while an in-kernel one-hot
gather pays O(slots x table_height) VPU work to build the selector masks —
measured strictly slower for the flagship's 2048-row source table (see git
history for the in-kernel-gather variant this replaced).

bfloat16 inputs run single-pass DEFAULT-precision MXU matmuls with f32
accumulation (matching the mixed-precision XLA path); float32 runs HIGHEST.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_CHOICES = (2048, 1024, 512, 256)  # destination rows per grid step —
# prefer large tiles: at 256 the per-step gate matmuls are MXU-latency-bound


def _pick_tile(n_dst: int) -> int:
    for t in _TILE_CHOICES:
        if n_dst % t == 0:
            return t
    return 0
_MAX_UNROLL_L = 32  # static time-step unroll bound

# Default OFF: in isolation this kernel beats the lax.scan path 8x (fwd
# 0.115 ms vs 0.903 ms at [8, 16384, 32]), but inside the flagship training
# step it REGRESSES 12.1 -> 23.8 ms: XLA pins the backward kernel's full
# [L, N, D] operands/results in scoped VMEM and the adjacent slice-sort
# backward gather (builder.py:451 transpose) slows 0.2 -> 1.19 ms/call
# (profiled, see PERF.md "fused GRU scan kernel"). The in-model scans cost
# only ~1.7 ms/step, so the ceiling never justified the interaction. Kept as
# an opt-in (IGNNITION_TPU_FUSED_RNN=auto|always) for standalone-RNN use.
_MODE = os.environ.get("IGNNITION_TPU_FUSED_RNN", "never")  # auto|never|always


def set_mode(mode: str) -> None:
    global _MODE
    if mode not in ("auto", "never", "always"):
        raise ValueError(f"invalid fused-rnn mode '{mode}'")
    _MODE = mode


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def scan_eligible(max_len: int, n_dst: int, d: int, u: int) -> bool:
    """Static-shape eligibility for the Pallas masked-GRU-scan kernel (the
    caller falls back to the lax.scan path otherwise)."""
    if _MODE == "never":
        return False
    if not (_on_tpu() or _MODE == "always"):
        return False
    return max_len <= _MAX_UNROLL_L and _pick_tile(n_dst) > 0


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _gru_gates(x, h, wx, wh, bx, bh, prec):
    """Gate values from one step's input and carry; returns (z, r, hcand, hh)."""
    u = h.shape[-1]
    xw = (
        jax.lax.dot_general(
            x, wx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        + bx
    )
    hw = (
        jax.lax.dot_general(
            h, wh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        + bh
    )
    z = jax.nn.sigmoid(xw[:, :u] + hw[:, :u])
    r = jax.nn.sigmoid(xw[:, u : 2 * u] + hw[:, u : 2 * u])
    hh = hw[:, 2 * u :]
    hcand = jnp.tanh(xw[:, 2 * u :] + r * hh)
    return z, r, hcand, hh


def _make_fwd_kernel(max_len: int, dtype):
    prec = _precision(dtype)

    def kernel(xs_ref, lens_ref, h0_ref, wx_ref, wh_ref, b_ref, out_ref):
        lens2 = lens_ref[0, 0][:, None]  # [TILE_P, 1] i32 (2-D: 1-bit
        # minor-dim inserts are unsupported by Mosaic)
        wx = wx_ref[:]
        wh = wh_ref[:]
        bx = b_ref[0:1, :].astype(jnp.float32)
        bh = b_ref[1:2, :].astype(jnp.float32)
        h = h0_ref[:].astype(jnp.float32)  # [TILE_P, u]

        for t in range(max_len):
            x = xs_ref[t]  # [TILE_P, d]
            z, r, hcand, _ = _gru_gates(x, h.astype(dtype), wx, wh, bx, bh, prec)
            h_new = z * h + (1.0 - z) * hcand
            h = jnp.where(lens2 > t, h_new, h)

        out_ref[:] = h.astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(max_len: int, dtype):
    prec = _precision(dtype)

    def kernel(
        xs_ref, lens_ref, h0_ref, wx_ref, wh_ref, b_ref, ct_ref,
        d_xs_ref, d_h0_ref, d_wx_ref, d_wh_ref, d_bx_ref, d_bh_ref,
        hprev_s, z_s, r_s, hc_s, hh_s,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            d_wx_ref[:] = jnp.zeros_like(d_wx_ref)
            d_wh_ref[:] = jnp.zeros_like(d_wh_ref)
            d_bx_ref[:] = jnp.zeros_like(d_bx_ref)
            d_bh_ref[:] = jnp.zeros_like(d_bh_ref)

        lens2 = lens_ref[0, 0][:, None]
        wx = wx_ref[:]
        wh = wh_ref[:]
        bx = b_ref[0:1, :].astype(jnp.float32)
        bh = b_ref[1:2, :].astype(jnp.float32)

        # ---- forward recompute, stashing per-step tensors in VMEM ----
        h = h0_ref[:].astype(jnp.float32)
        for t in range(max_len):
            z, r, hcand, hh = _gru_gates(
                xs_ref[t], h.astype(dtype), wx, wh, bx, bh, prec
            )
            hprev_s[t] = h
            z_s[t] = z
            r_s[t] = r
            hc_s[t] = hcand
            hh_s[t] = hh
            h_new = z * h + (1.0 - z) * hcand
            h = jnp.where(lens2 > t, h_new, h)

        # ---- reverse sweep ----
        dh = ct_ref[:].astype(jnp.float32)
        d_wx_acc = jnp.zeros(d_wx_ref.shape, jnp.float32)
        d_wh_acc = jnp.zeros(d_wh_ref.shape, jnp.float32)
        d_bx_acc = jnp.zeros(d_bx_ref.shape, jnp.float32)
        d_bh_acc = jnp.zeros(d_bh_ref.shape, jnp.float32)

        for t in range(max_len - 1, -1, -1):
            valid = lens2 > t
            dh_upd = jnp.where(valid, dh, 0.0)
            dh_carry = jnp.where(valid, 0.0, dh)

            hprev = hprev_s[t]
            z = z_s[t]
            r = r_s[t]
            hc = hc_s[t]
            hh = hh_s[t]

            dz = dh_upd * (hprev - hc)
            dhc = dh_upd * (1.0 - z)
            da_c = dhc * (1.0 - hc * hc)
            dhh = da_c * r
            dr = da_c * hh
            da_z = dz * z * (1.0 - z)
            da_r = dr * r * (1.0 - r)

            d_xw = jnp.concatenate([da_z, da_r, da_c], axis=1)  # [TILE_P, 3u]
            d_hw = jnp.concatenate([da_z, da_r, dhh], axis=1)

            d_wx_acc += jax.lax.dot_general(
                xs_ref[t], d_xw.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            d_wh_acc += jax.lax.dot_general(
                hprev.astype(dtype), d_hw.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            d_bx_acc += jnp.sum(d_xw, axis=0, keepdims=True)
            d_bh_acc += jnp.sum(d_hw, axis=0, keepdims=True)

            d_xs_ref[t] = jax.lax.dot_general(
                d_xw.astype(dtype), wx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(d_xs_ref.dtype)

            dh = (
                jax.lax.dot_general(
                    d_hw.astype(dtype), wh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                + dh_upd * z
                + dh_carry
            )

        d_h0_ref[:] = dh.astype(d_h0_ref.dtype)
        d_wx_ref[:] += d_wx_acc
        d_wh_ref[:] += d_wh_acc
        d_bx_ref[:] += d_bx_acc
        d_bh_ref[:] += d_bh_acc

    return kernel


def _interpret() -> bool:
    return not _on_tpu()


def _common_specs(d, u, max_len, tile_p):
    return [
        pl.BlockSpec((max_len, tile_p, d), lambda i: (0, i, 0)),  # xs
        pl.BlockSpec((1, 1, tile_p), lambda i: (i, 0, 0)),  # lens
        pl.BlockSpec((tile_p, u), lambda i: (i, 0)),  # h0
        pl.BlockSpec((d, 3 * u), lambda i: (0, 0)),  # wx
        pl.BlockSpec((u, 3 * u), lambda i: (0, 0)),  # wh
        pl.BlockSpec((2, 3 * u), lambda i: (0, 0)),  # bias
    ]


def _fwd_call(xs, lens_t, h0, wx, wh, b):
    max_len, n_dst, d = xs.shape
    u = h0.shape[1]
    tile_p = _pick_tile(n_dst)
    n_tiles = n_dst // tile_p
    return pl.pallas_call(
        _make_fwd_kernel(max_len, xs.dtype),
        grid=(n_tiles,),
        in_specs=_common_specs(d, u, max_len, tile_p),
        out_specs=pl.BlockSpec((tile_p, u), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_dst, u), h0.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xs, lens_t, h0, wx, wh, b)


def _bwd_call(xs, lens_t, h0, wx, wh, b, ct):
    max_len, n_dst, d = xs.shape
    u = h0.shape[1]
    tile_p = _pick_tile(n_dst)
    n_tiles = n_dst // tile_p
    return pl.pallas_call(
        _make_bwd_kernel(max_len, xs.dtype),
        grid=(n_tiles,),
        in_specs=_common_specs(d, u, max_len, tile_p)
        + [pl.BlockSpec((tile_p, u), lambda i: (i, 0))],  # ct
        out_specs=[
            pl.BlockSpec((max_len, tile_p, d), lambda i: (0, i, 0)),  # d_xs
            pl.BlockSpec((tile_p, u), lambda i: (i, 0)),  # d_h0
            pl.BlockSpec((d, 3 * u), lambda i: (0, 0)),  # d_wx (accum)
            pl.BlockSpec((u, 3 * u), lambda i: (0, 0)),  # d_wh (accum)
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0)),  # d_bx (accum)
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0)),  # d_bh (accum)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_len, n_dst, d), xs.dtype),
            jax.ShapeDtypeStruct((n_dst, u), jnp.float32),
            jax.ShapeDtypeStruct((d, 3 * u), jnp.float32),
            jax.ShapeDtypeStruct((u, 3 * u), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * u), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * u), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_len, tile_p, u), jnp.float32),  # hprev
            pltpu.VMEM((max_len, tile_p, u), jnp.float32),  # z
            pltpu.VMEM((max_len, tile_p, u), jnp.float32),  # r
            pltpu.VMEM((max_len, tile_p, u), jnp.float32),  # hcand
            pltpu.VMEM((max_len, tile_p, u), jnp.float32),  # hh
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xs, lens_t, h0, wx, wh, b, ct)


@jax.custom_vjp
def _scan_core(xs, lens_t, h0, wx, wh, b):
    return _fwd_call(xs, lens_t, h0, wx, wh, b)


def _sc_fwd(xs, lens_t, h0, wx, wh, b):
    out = _fwd_call(xs, lens_t, h0, wx, wh, b)
    return out, (xs, lens_t, h0, wx, wh, b)


def _sc_bwd(res, ct):
    xs, lens_t, h0, wx, wh, b = res
    d_xs, d_h0, d_wx, d_wh, d_bx, d_bh = _bwd_call(xs, lens_t, h0, wx, wh, b, ct)
    d_b = jnp.concatenate([d_bx, d_bh], axis=0).astype(b.dtype)
    return (
        d_xs,
        None,
        d_h0.astype(h0.dtype),
        d_wx.astype(wx.dtype),
        d_wh.astype(wh.dtype),
        d_b,
    )


_scan_core.defvjp(_sc_fwd, _sc_bwd)


def masked_gru_scan(
    xs: jnp.ndarray,  # [max_len, n_dst, d] time-major input slices
    lens: jnp.ndarray,  # [n_dst] int32 real message counts
    h0: jnp.ndarray,  # [n_dst, u] destination states
    params,  # GRU params: kernel [d, 3u], recurrent_kernel [u, 3u], bias [2, 3u]
) -> jnp.ndarray:
    """Masked GRU scan as one Pallas kernel (see module docstring).

    Equivalent to nn.rnn.masked_update_stacked's GRU lax.scan, with gradients
    for xs, h0, and the GRU parameters.
    """
    max_len, n_dst, _ = xs.shape
    tile_p = _pick_tile(n_dst)
    n_tiles = n_dst // tile_p
    lens_t = lens.reshape(n_tiles, 1, tile_p).astype(jnp.int32)
    dtype = xs.dtype
    return _scan_core(
        xs,
        lens_t,
        h0.astype(dtype),
        params["kernel"].astype(dtype),
        params["recurrent_kernel"].astype(dtype),
        params["bias"].astype(dtype),
    )
