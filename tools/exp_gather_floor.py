"""Experiment: is the measured ~1.5-2 ns/row random-row gather floor XLA's
descriptor path, or the hardware itself? (VERDICT r3 'Next round' #5.)

The apsol bound charges data-dependent row movement at the floor bench.py
calibrates with XLA's gather (262144 random rows of a [16384, 32] bf16
table). PERF.md already closed the MXU one-hot route; this experiment
probes the remaining two:

**Per-row DMA batching is INEXPRESSIBLE.** Mosaic requires every memref
slice to be tile-aligned in the sublane dimension (8 rows f32 / 16 rows
bf16): forming `table.at[pl.ds(idx, 1), :]` fails to compile with
"Slice shape along dimension 0 must be aligned to tiling (8), but is 1",
and in-kernel vector loads at dynamic single-row offsets fail with
"cannot statically prove that index in dimension 0 is a multiple of 8".
The smallest data-dependent unit ANY Pallas kernel can move — by DMA or
by vector load — is an aligned (8, 128) tile, so a kernel gathering
random 64 B rows must move >=8x the bytes. Mosaic's in-register
dynamic_gather (jnp.take lowering) only shuffles WITHIN a vreg's
sublanes, not across a 16k-row table.

**What remains measurable**: the descriptor-issue rate at the expressible
granularity. Variants (f32 so the aligned tile is 8 rows):

  xla_row_bf16 — the calibration shape itself (baseline)
  xla_row_d{8,32,128} — XLA row gather vs row width: if ns/row is flat in
      width, the cost is per-DESCRIPTOR, not per-byte
  xla_block8 — XLA gathering the SAME bytes as 8-row aligned blocks
      (table reshaped [2048, 256]): descriptor count / 8
  dma_block8_hbm — Pallas rolling window of NBUF outstanding aligned
      8-row block DMAs from an HBM-resident table
  dma_block8_vmem — same loop, table VMEM-resident (local copies: probes
      the issue path without HBM in the loop)

If the Pallas per-descriptor cost is >= XLA's, XLA's gather already
saturates the descriptor hardware and the floor is hardware, not
software — apsol upgrades from "measured XLA behavior" to "measured
hardware behavior". Conclusion recorded in PERF.md 'The gather floor'.

Timing is fetch-based (CLAUDE.md: block_until_ready does not reliably
block through the tunnel).

Usage: python -m tools.exp_gather_floor [--rows 262144] [--nbuf 16]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, *args, iters=30, trials=3):
    import jax.numpy as jnp

    def fetch(o):
        return float(o) if o.ndim == 0 else float(jnp.sum(o))

    fetch(fn(*args))  # compile

    def trial():
        t0 = time.time()
        fetch(fn(*args))
        base = time.time() - t0
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        return max(time.time() - t0 - base, 1e-9) / (iters - 1)

    return min(trial() for _ in range(trials))


def _dma_block_kernel_factory(nbuf, tile_b):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(bidx_ref, table_ref, out_ref, sems):
        def get(j):
            row = pl.multiple_of(bidx_ref[j] * 8, 8)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 8), :],
                out_ref.at[pl.ds(j * 8, 8), :],
                sems.at[j % nbuf],
            )

        for j in range(nbuf):
            get(j).start()

        def body(j, _):
            get(j).wait()

            @pl.when(j + nbuf < tile_b)
            def _():
                get(j + nbuf).start()

            return 0

        jax.lax.fori_loop(0, tile_b, body, 0)

    return kernel


def build_variants(rows: int, n_src: int, tile: int, nbuf: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {}

    def xla_gather(d, dtype):
        rng = np.random.default_rng(0)
        table = jax.device_put(
            jnp.asarray(rng.standard_normal((n_src, d)), dtype)
        )
        idx = jax.device_put(jnp.asarray(rng.integers(0, n_src, rows), jnp.int32))

        @jax.jit
        def g(t, i):
            return jnp.sum(t[i].astype(jnp.float32))

        return g, (table, idx), rows

    out["xla_row_bf16_d32"] = xla_gather(32, jnp.bfloat16)
    for d in (8, 32, 128):
        out[f"xla_row_f32_d{d}"] = xla_gather(d, jnp.float32)

    # ---- aligned 8-row x 128-lane blocks (the minimum expressible DMA:
    # lane slices must be 128-aligned too, so one full (8,128) f32 tile =
    # 4 KB is the smallest data-dependent unit a kernel can move) --------
    n_blocks, d_blk = rows // 8, 128
    blk_w = 8 * d_blk
    rng = np.random.default_rng(1)
    table_f32 = jax.device_put(
        jnp.asarray(rng.standard_normal((n_src, d_blk)), jnp.float32)
    )
    bidx = jax.device_put(
        jnp.asarray(rng.integers(0, n_src // 8, n_blocks), jnp.int32)
    )

    @jax.jit
    def xla_block8(t, b):
        return jnp.sum(t.reshape(n_src // 8, blk_w)[b])

    out["xla_block8"] = (xla_block8, (table_f32, bidx), n_blocks)

    # ---- Pallas rolling-DMA aligned 8-row blocks -----------------------
    # SMEM int32 blocks must be 1024-element aligned (XLA layout), so each
    # grid step handles 1024 blocks = 8192 output rows (4 MB f32 block)
    tile_b = 1024
    grid = n_blocks // tile_b
    out_shape = jax.ShapeDtypeStruct((rows, d_blk), jnp.float32)

    def dma_variant(space, n_src_local):
        kern = _dma_block_kernel_factory(nbuf, tile_b)
        rng = np.random.default_rng(2)
        t_loc = jax.device_put(jnp.asarray(
            rng.standard_normal((n_src_local, d_blk)), jnp.float32))
        b_loc = jax.device_put(jnp.asarray(
            rng.integers(0, n_src_local // 8, n_blocks), jnp.int32))

        @jax.jit
        def f(t, b):
            o = pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((tile_b,), lambda i: (i,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=space),
                ],
                out_specs=pl.BlockSpec((tile_b * 8, d_blk), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=out_shape,
                scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(b, t)
            return jnp.sum(o)

        return f, (t_loc, b_loc), n_blocks

    # VMEM variant: 2 MB table so table + the 4 MB out block fit on-chip
    out["dma_block8_hbm"] = dma_variant(pltpu.HBM, n_src)
    out["dma_block8_vmem"] = dma_variant(pltpu.VMEM, 4096)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=262144)
    p.add_argument("--src", type=int, default=16384)
    p.add_argument("--tile", type=int, default=2048)
    p.add_argument("--nbuf", type=int, default=16)
    p.add_argument("--only", default=None)
    args = p.parse_args()

    variants = build_variants(args.rows, args.src, args.tile, args.nbuf)
    for name, (fn, fargs, n_desc) in variants.items():
        if args.only and args.only not in name:
            continue
        try:
            dt = _timeit(fn, *fargs)
            print(f"{name:20s} {dt*1e3:8.3f} ms  "
                  f"{dt/args.rows*1e9:6.2f} ns/row  "
                  f"{dt/n_desc*1e9:7.2f} ns/descriptor",
                  flush=True)
        except Exception as e:
            msg = str(e)
            key = "Mosaic failed to compile TPU kernel:"
            if key in msg:
                msg = msg.split(key)[1].split(chr(10))[0]
            else:
                msg = msg.split(chr(10))[0][:140]
            print(f"{name:20s} FAILED: {msg.strip()}", flush=True)


if __name__ == "__main__":
    main()
