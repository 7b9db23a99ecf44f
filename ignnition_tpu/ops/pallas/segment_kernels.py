"""Pallas TPU kernels for the segment-sum (SpMM-shaped) aggregation hot loop.

The reference's aggregation is `tf.math.unsorted_segment_sum` over gathered
per-edge messages (auxilary_classes.py:241-262, 342-343, 387). XLA lowers
segment sums to scatter-adds, which serialize on TPU. This kernel exploits
the destination-sorted COO layout the data layer guarantees:

  * grid over destination row tiles ([TILE_N, D] output blocks);
  * a scalar-prefetched row-pointer array gives each tile its contiguous
    edge range [start, end);
  * the inner loop DMAs fixed-size edge chunks (messages + segment ids) from
    HBM into VMEM double buffers and accumulates
        acc += onehot(local_dst_row) @ chunk
    on the MXU — turning the scatter into dense matmuls.

Edges must be sorted by segment id; the caller pads the edge axis so
out-of-range reads are safe and padded ids point past the last segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # destination rows per grid step
CHUNK = 256  # edges per inner-loop step


def _kernel(row_ptr_ref, data_ref, seg_ref, out_ref, msg_buf, seg_buf, sems):
    i = pl.program_id(0)
    start = row_ptr_ref[i]
    end = row_ptr_ref[i + 1]
    row_base = i * TILE_N

    out_ref[:] = jnp.zeros_like(out_ref)

    n_chunks = pl.cdiv(end - start, CHUNK)

    def get_dmas(slot, c):
        offs = start + c * CHUNK
        d = pltpu.make_async_copy(
            data_ref.at[pl.ds(offs, CHUNK), :], msg_buf.at[slot], sems.at[slot, 0]
        )
        s = pltpu.make_async_copy(
            seg_ref.at[pl.ds(offs, CHUNK), :], seg_buf.at[slot], sems.at[slot, 1]
        )
        return d, s

    @pl.when(n_chunks > 0)
    def _():
        d, s = get_dmas(0, 0)
        d.start()
        s.start()

    def body(c, _):
        slot = c % 2
        nxt = (c + 1) % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            d, s = get_dmas(nxt, c + 1)
            d.start()
            s.start()

        d, s = get_dmas(slot, c)
        d.wait()
        s.wait()

        seg = seg_buf[slot]  # [CHUNK, 1] int32
        chunk = msg_buf[slot]  # [CHUNK, D]
        edge_pos = start + c * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, 1), 0
        )
        valid = edge_pos < end
        local = seg[:, 0] - row_base  # [CHUNK]
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, CHUNK), 0)
        onehot = jnp.where(
            (rows == local[None, :]) & valid[None, :, 0], 1.0, 0.0
        ).astype(jnp.float32)
        out_ref[:] += jnp.dot(onehot, chunk, preferred_element_type=jnp.float32)
        return _

    jax.lax.fori_loop(0, n_chunks, body, None)


@functools.partial(jax.jit, static_argnums=(2,))
def sorted_segment_sum_pallas(
    data: jnp.ndarray,  # [E, D] float32, sorted by segment id
    segment_ids: jnp.ndarray,  # [E] int32, non-decreasing
    num_segments: int,
) -> jnp.ndarray:
    e, d = data.shape
    n_pad = ((num_segments + TILE_N - 1) // TILE_N) * TILE_N
    e_pad = ((e + CHUNK - 1) // CHUNK) * CHUNK + CHUNK  # slack for chunk overreads

    data_p = jnp.zeros((e_pad, d), data.dtype).at[:e].set(data)
    seg_p = jnp.full((e_pad, 1), n_pad, jnp.int32).at[:e, 0].set(segment_ids)

    # row pointers per destination tile: first edge whose segment id reaches
    # the tile's base row (edges sorted by id)
    n_tiles = n_pad // TILE_N
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_N
    row_ptr = jnp.searchsorted(seg_p[:e, 0], bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # seg ids stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, d), jnp.float32),
            pltpu.VMEM((2, CHUNK, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * TILE_N * d,
            bytes_accessed=e_pad * d * 4 + e_pad * 4 + n_pad * d * 4,
            transcendentals=0,
        ),
    )(row_ptr, data_p, seg_p)
    return out[:num_segments]
