"""Pallas TPU kernels for the segment-sum (SpMM-shaped) aggregation hot loop.

The reference's aggregation is `tf.math.unsorted_segment_sum` over gathered
per-edge messages (auxilary_classes.py:241-262, 342-343, 387). XLA lowers
segment sums to scatter-adds, which serialize on TPU. This kernel exploits
the destination-sorted COO layout the data layer guarantees:

  * grid over destination row tiles ([TILE_N, D] output blocks);
  * a scalar-prefetched row-pointer array gives each tile its contiguous
    edge range [start, end);
  * the inner loop DMAs fixed-size edge chunks from HBM into VMEM double
    buffers and accumulates
        acc += onehot(local_dst_row)^T @ chunk
    on the MXU — turning the scatter into dense matmuls.

TPU layout constraints shape the data plumbing: dynamic slicing is only
legal on the sublane (edge) dimension, and 1-lane-wide arrays can't be
DMA'd. So the segment id of each edge travels as an extra float32 column
packed into the lane-aligned message matrix, and is extracted in-kernel with
a lane-selector matmul (exact for ids < 2^24).

Edges must be sorted by segment id; the wrapper pads the edge axis so
out-of-range chunk reads are safe and padded ids point past the last segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # destination rows per grid step
CHUNK = 256  # edges per inner-loop step


def _make_kernel(d: int):
    def kernel(row_ptr_ref, data_ref, out_ref, msg_buf, sems):
        i = pl.program_id(0)
        # chunk starts are CHUNK-aligned: Mosaic requires tile-aligned dynamic
        # DMA offsets, and edges over-read at either end are rejected by the
        # one-hot id comparison (their ids fall outside this tile's rows)
        start = (row_ptr_ref[i] // CHUNK) * CHUNK
        end = row_ptr_ref[i + 1]
        row_base = i * TILE_N

        out_ref[:] = jnp.zeros_like(out_ref)

        n_chunks = pl.cdiv(end - start, CHUNK)

        def get_dma(slot, c):
            offs = pl.multiple_of(start + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(offs, CHUNK), :],
                msg_buf.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(c, carry):
            slot = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(nxt, c + 1).start()

            get_dma(slot, c).wait()

            chunk = msg_buf[slot]  # [CHUNK, d]; last lane = segment id
            # extract the id column with a VPU masked lane-reduction (exact
            # f32; an MXU selector matmul would round ids through bf16 passes)
            lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, d), 1)
            seg = jnp.sum(
                jnp.where(lane == d - 1, chunk, 0.0), axis=1, keepdims=True
            )  # [CHUNK, 1] float ids (exact below 2^24)

            # transposed one-hot [CHUNK, TILE_N]; contract the edge dim on
            # the MXU (no transposes, no lane-dim dynamic slicing). Edges
            # outside this tile's row range never match any column.
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, TILE_N), 1
            ).astype(jnp.float32)
            onehot = jnp.where(
                cols == seg - jnp.float32(1.0) * row_base, 1.0, 0.0
            )
            out_ref[:] += jax.lax.dot_general(
                onehot,
                chunk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes
            )
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _sorted_segment_sum_impl(
    data: jnp.ndarray,  # [E, D] float32, sorted by segment id
    segment_ids: jnp.ndarray,  # [E] int32, non-decreasing
    num_segments: int,
) -> jnp.ndarray:
    e, d_in = data.shape
    d = ((d_in + 1 + 127) // 128) * 128  # lane-align features + id column
    n_pad = ((num_segments + TILE_N - 1) // TILE_N) * TILE_N
    e_pad = ((e + CHUNK - 1) // CHUNK) * CHUNK + CHUNK  # slack for overreads

    data_p = (
        jnp.zeros((e_pad, d), jnp.float32)
        .at[:e, :d_in]
        .set(data.astype(jnp.float32))
        .at[:, d - 1]
        .set(
            jnp.full((e_pad,), n_pad, jnp.float32)
            .at[:e]
            .set(segment_ids.astype(jnp.float32))
        )
    )

    # row pointers per destination tile: first edge whose segment id reaches
    # the tile's base row (edges sorted by id)
    n_tiles = n_pad // TILE_N
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_N
    row_ptr = jnp.searchsorted(segment_ids, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # edge messages stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        _make_kernel(d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * TILE_N * d,
            bytes_accessed=e_pad * d * 4 + n_pad * d * 4,
            transcendentals=0,
        ),
    )(row_ptr, data_p)
    return out[:num_segments, :d_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sorted_segment_sum_pallas(data, segment_ids, num_segments):
    """Differentiable sorted-COO segment sum (Pallas forward, gather VJP:
    d(data) = cotangent[segment_ids] — the exact transpose of a segment sum)."""
    return _sorted_segment_sum_impl(data, segment_ids, num_segments)


def _sss_fwd(data, segment_ids, num_segments):
    out = _sorted_segment_sum_impl(data, segment_ids, num_segments)
    return out, (segment_ids, jnp.zeros((), data.dtype))


def _sss_bwd(num_segments, res, ct):
    segment_ids, proto = res
    return ct[segment_ids].astype(proto.dtype), None


sorted_segment_sum_pallas.defvjp(_sss_fwd, _sss_bwd)


# ==========================================================================
# Packed kernel: PACK = 128 // D edges per lane row, ids derived from row
# pointers — no id column, no lane-padding waste. Used when D divides 128.
# ==========================================================================


def _make_packed_kernel(
    d: int, pack: int, chunk_rows: int, tile_n: int, dtype=jnp.float32
):
    lanes = d * pack  # == 128
    # bf16 inputs ride half the DMA bytes and are upcast to f32 in-register
    # (keeps all vector layouts uniform — mixing i1 masks across 8x128/16x128
    # tilings trips Mosaic relayouts); since bf16 values are exact in f32 and
    # the one-hot is 0/1, a single DEFAULT-precision bf16 MXU pass is exact.
    # f32 inputs need HIGHEST (6 passes) for exactness.
    precision = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def kernel(row_ptr_ref, data_ref, lo_ref, hi_ref, out_ref, buf, sems):
        i = pl.program_id(0)
        start = row_ptr_ref[i * tile_n]
        end = row_ptr_ref[(i + 1) * tile_n]
        row0 = ((start // pack) // chunk_rows) * chunk_rows
        rows_needed = pl.cdiv(end, pack) - row0
        n_chunks = pl.cdiv(rows_needed, chunk_rows)

        lo = lo_ref[0, 0]  # [tile_n] first edge of each tile segment
        hi = hi_ref[0, 0]  # [tile_n] one-past-last edge

        def get_dma(slot, c):
            offs = pl.multiple_of(row0 + c * chunk_rows, chunk_rows)
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(offs, chunk_rows), :], buf.at[slot], sems.at[slot]
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        acc0 = jnp.zeros((tile_n, lanes), jnp.float32)

        def body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            chunk = buf[slot].astype(jnp.float32)  # [chunk_rows, lanes]
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, tile_n), 0)
            base = (row0 + c * chunk_rows) * pack

            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, lanes), 1)
            for k in range(pack):
                pos = base + r_iota * pack + k  # global edge index of sub-slot k
                onehot = jnp.where(
                    (pos >= lo[None, :]) & (pos < hi[None, :]), 1.0, 0.0
                )
                masked = jnp.where(lane // d == k, chunk, 0.0)
                acc = acc + jax.lax.dot_general(
                    onehot,
                    masked,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            return acc

        acc = jax.lax.fori_loop(0, n_chunks, body, acc0)

        # collapse the `pack` lane blocks: [tile_n, lanes] @ S -> [tile_n, d]
        # with S[j, j % d] = 1 (0/1-exact under full-precision passes)
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (lanes, d), 0)
        colsel = jax.lax.broadcasted_iota(jnp.int32, (lanes, d), 1)
        s_mat = jnp.where(rowsel % d == colsel, 1.0, 0.0)
        out_ref[:] = jax.lax.dot_general(
            acc,
            s_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return kernel


def _packed_impl(data, row_ptr, num_segments):
    """row_ptr: [num_segments + 1] int32 CSR pointers into the sorted edge
    axis (the data layer precomputes these host-side, over REAL edges only —
    padding edges fall outside every [lo, hi) range and are ignored).

    bf16 data is consumed natively (half the DMA traffic, single-pass MXU);
    when the packed row count is chunk-aligned the repack is a zero-copy
    bitcast reshape instead of a pad-copy.
    """
    e, d = data.shape
    pack = 128 // d
    # tile_n=128 measured best across segment counts (widening the tile
    # multiplies one-hot MXU work faster than it amortizes grid overhead)
    chunk_rows = 256
    tile_n = TILE_N
    n_pad = ((num_segments + tile_n - 1) // tile_n) * tile_n

    dtype = data.dtype if data.dtype == jnp.bfloat16 else jnp.float32
    data = data.astype(dtype)

    rows = (e + pack - 1) // pack
    if e % pack == 0 and rows % chunk_rows == 0:
        # zero-copy: row-major [E, D] -> [rows, 128] is a bitcast, and every
        # chunk DMA stays within [0, rows) because rows is chunk-aligned and
        # CSR ends never exceed the real edge count
        rows_pad = rows
        packed = data.reshape(rows_pad, 128)
    else:
        rows_pad = (
            ((rows + chunk_rows - 1) // chunk_rows) * chunk_rows + chunk_rows
        )
        e_pad = rows_pad * pack
        flat = jnp.zeros((e_pad * d,), dtype).at[: e * d].set(data.reshape(-1))
        packed = flat.reshape(rows_pad, 128)

    row_ptr = jnp.concatenate(
        [row_ptr, jnp.full((n_pad - num_segments,), row_ptr[-1], row_ptr.dtype)]
    ).astype(jnp.int32)
    lo = row_ptr[:n_pad].reshape(n_pad // tile_n, 1, tile_n)
    hi = row_ptr[1 : n_pad + 1].reshape(n_pad // tile_n, 1, tile_n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed edge features
            pl.BlockSpec(
                (1, 1, tile_n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tile_n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_packed_kernel(d, pack, chunk_rows, tile_n, dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * pack * tile_n * 128,
            bytes_accessed=rows_pad * 128 * jnp.dtype(dtype).itemsize
            + n_pad * d * 4,
            transcendentals=0,
        ),
    )(row_ptr, packed, lo, hi)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sorted_segment_sum_csr(data, segment_ids, row_ptr, num_segments):
    """Sorted-COO segment sum with precomputed CSR row pointers.

    Forward dispatches to the packed kernel (no id column, no lane padding)
    when the feature dim divides 128, else to the id-column kernel.
    Backward is the exact transpose: a gather by segment id.
    """
    if 128 % data.shape[1] == 0:
        return _packed_impl(data, row_ptr, num_segments)
    return _sorted_segment_sum_impl(data, segment_ids, num_segments)


def _csr_fwd(data, segment_ids, row_ptr, num_segments):
    out = sorted_segment_sum_csr(data, segment_ids, row_ptr, num_segments)
    return out, (segment_ids, jnp.zeros((), data.dtype))


def _csr_bwd(num_segments, res, ct):
    segment_ids, proto = res
    return ct[segment_ids].astype(proto.dtype), None, None


sorted_segment_sum_csr.defvjp(_csr_fwd, _csr_bwd)
