"""Edge partitioning v2 — destination-sharded node state with boundary halo
exchange (the BASELINE.json north star; no reference counterpart, SURVEY §2.4).

v1 (parallel/steps.py `edge_axis`) replicates every node table and all-reduces
a full [n_dst, D] partial per adjacency per iteration: comm grows with the
TOTAL destination count and node memory does not scale. v2 shards:

  * **node state**: each entity's padded rows split into contiguous blocks of
    size B = node_pad / n_model; shard k owns rows [k*B, (k+1)*B). Hidden
    states, feature init, RNN/FF updates, and readout all run on the local
    block — compute AND memory scale with the model axis.
  * **edges**: each adjacency's destination-sorted edges are assigned to the
    shard owning their DESTINATION, so every aggregation (sum / ordered /
    attention / convolution / concat / interleave) is purely local — the
    per-destination segment structure never crosses shards.
  * **boundary exchange**: the only cross-shard data is the source rows a
    shard's edges reference from other owners (the edge-cut halo). Shard j
    gathers the rows each peer needs (`halo_send` index table, host-built)
    and one `lax.all_to_all` per adjacency per iteration delivers them; the
    local table is then `concat(own_block, halo)` and edge gathers read
    remapped indices. Comm per shard per adjacency per iteration is
    n_model * H * D where H = max boundary rows between any pair —
    proportional to the CUT, not to n_dst (docs/scaling.md has the accounting).

Merged multi-graph batches lay each graph's nodes contiguously, so contiguous
blocks keep most edges interior; for one giant graph the halo is the real
edge cut of the row ordering.

AD: the halo is plain gather -> all_to_all -> concat, so the cotangent of a
remote row routes back through the transposed all_to_all and scatter-adds
into its owner's block automatically — gradients need no hand-written
collectives. Parameters stay replicated; shard_map's varying-axes semantics
all-reduces their cotangents (same contract as parallel/steps.py).

Label domains: entity labels shard with their entity's blocks; edge-domain
labels (readouts through extend_adjacencies) shard with their adjacency's
destination-owned edges — the readout's final-state extend gathers through
one more halo exchange, and `edge_origin_{adj}` maps local predictions back
to the merged batch's edge order host-side. Entity-shaped additional
readout inputs shard by their recorded block layout (meta.extra_layout).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data.graph import BatchMeta, adjacency_aux_arrays, infer_label_domain
from ..model.builder import GnnModel
from ..training.losses import loss_reduction

_HALO_MULTIPLE = 8  # round the halo height to keep lanes happy / shapes stable


class EdgeShardError(ValueError):
    pass


# --------------------------------------------------------------------------
# host-side partitioner
# --------------------------------------------------------------------------


def partition_dims(stacked: Dict[str, np.ndarray]) -> Dict[str, Dict[str, int]]:
    """Shape-defining dims of a partitioned batch ({'halo': {adj: H},
    'edges': {adj: E_loc}}) — feed back as partition_batch(pad_to=...) so a
    stream of batches keeps ONE static shape (jit cache stability)."""
    halo = {
        k[len("halo_send_"):]: int(v.shape[-1])
        for k, v in stacked.items()
        if k.startswith("halo_send_")
    }
    edges = {
        k[len("src_"):]: int(v.shape[-1])
        for k, v in stacked.items()
        if k.startswith("src_")
    }
    return {"halo": halo, "edges": edges}


def partition_batch(
    arrays: Dict[str, np.ndarray],
    meta: BatchMeta,
    model_ir,
    n_model: int,
    pad_to: Optional[Dict[str, Dict[str, int]]] = None,
) -> Tuple[Dict[str, np.ndarray], BatchMeta]:
    """Split one merged batch into n_model destination-sharded local batches.

    Returns (stacked arrays with leading [n_model] shard axis, local meta).
    Every local batch is a self-contained GraphBatch over the shard's node
    blocks: local row_ptr/lens companions are recomputed so the single-device
    fast paths (sorted-COO segment sums, masked_update_from_edges) apply
    unchanged; source indices are remapped into the halo-extended table
    layout [0, B_src + n_model*H).
    """
    if n_model < 2:
        raise EdgeShardError("edge partitioning needs n_model >= 2")
    label_dom = infer_label_domain(model_ir)

    entities = model_ir.entities
    adj_info = model_ir.adjacency_info()

    # ---- node blocks ----
    block: Dict[str, int] = {}
    for e in entities:
        n_pad = meta.nodes(e.name)
        block[e.name] = -(-n_pad // n_model)  # ceil

    local: List[Dict[str, np.ndarray]] = [dict() for _ in range(n_model)]

    def slice_rows(a: np.ndarray, ent: str, fill=0) -> List[np.ndarray]:
        """Global node-row array -> per-shard blocks (zero-fill the tail)."""
        b = block[ent]
        out = []
        for k in range(n_model):
            lo, hi = k * b, min((k + 1) * b, a.shape[0])
            part = a[lo:hi]
            if part.shape[0] < b:
                pad = np.full((b - part.shape[0],) + a.shape[1:], fill, a.dtype)
                part = np.concatenate([part, pad], 0)
            out.append(part)
        return out

    for e in entities:
        for key, fill in (
            (f"node_mask_{e.name}", 0),
            (f"graph_id_{e.name}", max(meta.num_graphs - 1, 0)),
        ):
            for k, part in enumerate(slice_rows(arrays[key], e.name, fill)):
                local[k][key] = part
        for f in e.features:
            for k, part in enumerate(slice_rows(arrays[f.name], e.name)):
                local[k][f.name] = part

    # ---- labels (edge-domain labels shard with their adjacency below) ----
    label_pad = 0
    if "label" in arrays:
        if label_dom[0] == "entity":
            ent = label_dom[1]
            for key in ("label", "label_mask"):
                for k, part in enumerate(slice_rows(arrays[key], ent)):
                    local[k][key] = part
            label_pad = block[ent]
        elif label_dom[0] == "graph":  # replicated
            for k in range(n_model):
                local[k]["label"] = arrays["label"]
                local[k]["label_mask"] = arrays["label_mask"]
            label_pad = meta.label_pad

    # ---- additional readout inputs: entity-shaped rows follow their
    # entity's block layout (build_batch recorded the match in
    # meta.extra_layout); flat non-entity inputs have no shardable domain ----
    extra_layout = dict(meta.extra_layout)
    for name in model_ir.additional_inputs():
        ent = extra_layout.get(name, "")
        if not ent:
            raise EdgeShardError(
                f"additional readout input '{name}' is not entity-shaped "
                "(its rows match no entity's node counts) and cannot be "
                "destination-sharded; use the replicated edge_axis strategy"
            )
        for k, part in enumerate(slice_rows(arrays[name], ent)):
            local[k][name] = part

    # ---- adjacencies ----
    edge_pad: Dict[str, int] = {}
    for a in adj_info:
        src = arrays[f"src_{a.name}"]
        dst = arrays[f"dst_{a.name}"]
        seq = arrays[f"seq_{a.name}"]
        emask = arrays[f"edge_mask_{a.name}"]
        params = arrays.get(f"params_{a.name}")
        b_src, b_dst = block[a.src], block[a.dst]

        real = emask > 0
        owner = dst // b_dst  # destination-sorted => owner blocks contiguous
        per_shard_idx = [np.nonzero(real & (owner == k))[0] for k in range(n_model)]

        # halo need-sets: rows of remote owners referenced by each shard
        need: List[List[np.ndarray]] = [[None] * n_model for _ in range(n_model)]
        h = 0
        for k in range(n_model):
            s_k = src[per_shard_idx[k]]
            s_owner = s_k // b_src
            for j in range(n_model):
                if j == k:
                    continue
                rows = np.unique(s_k[s_owner == j])
                need[k][j] = rows
                h = max(h, rows.size)
        if h > 0:
            h = -(-h // _HALO_MULTIPLE) * _HALO_MULTIPLE
        if pad_to is not None:
            h = max(h, int(pad_to.get("halo", {}).get(a.name, 0)))
        use_halo = h > 0
        ext = b_src + (n_model * h if use_halo else 0)

        e_loc = max(idx.size for idx in per_shard_idx)
        e_loc = max(int(np.asarray(meta.edges(a.name)) // n_model), e_loc, 1)
        if pad_to is not None:
            e_loc = max(e_loc, int(pad_to.get("edges", {}).get(a.name, 0)))
        edge_pad[a.name] = e_loc

        for k in range(n_model):
            idx = per_shard_idx[k]
            n = idx.size
            l_src = np.full(e_loc, ext - 1, np.int32)
            l_dst = np.full(e_loc, b_dst - 1, np.int32)
            l_seq = np.zeros(e_loc, np.int32)
            l_mask = np.zeros(e_loc, np.float32)
            l_par = (
                np.zeros((e_loc,) + params.shape[1:], params.dtype)
                if params is not None
                else None
            )
            # remap sources into the extended-table layout
            s_k = src[idx]
            s_owner = s_k // b_src
            rem = s_k - s_owner * b_src
            mapped = rem.copy()
            for j in range(n_model):
                if j == k or need[k][j] is None or need[k][j].size == 0:
                    continue
                sel = s_owner == j
                pos = np.searchsorted(need[k][j], s_k[sel])
                mapped[sel] = b_src + j * h + pos
            l_src[:n] = mapped
            l_dst[:n] = dst[idx] - k * b_dst
            l_seq[:n] = seq[idx]
            l_mask[:n] = 1.0
            if l_par is not None:
                l_par[:n] = params[idx]

            if use_halo:
                # interior/boundary split for comm/compute overlap: interior
                # edges (source rows owned locally) aggregate from the local
                # block while the halo all_to_all is in flight; boundary
                # edges read the received halo rows (builder._halo_gather)
                l_int = np.zeros(e_loc, np.float32)
                l_bnd = np.zeros(e_loc, np.float32)
                l_int[:n] = (s_owner == k).astype(np.float32)
                l_bnd[:n] = (s_owner != k).astype(np.float32)
                local[k][f"interior_emask_{a.name}"] = l_int
                local[k][f"boundary_emask_{a.name}"] = l_bnd

            # edge-domain labels shard with their adjacency's edges: label
            # row i of the merged batch is aligned with (destination-sorted)
            # edge i, so the shard's edge selection IS its label selection.
            # edge_origin_{adj} records each local edge's merged index (-1
            # padding) for host-side reassembly of sharded predictions.
            if label_dom == ("edge", a.name):
                if "label" in arrays:
                    # keep trailing feature dims (multi-unit edge labels),
                    # mirroring the entity-domain slice path
                    l_lab = np.zeros(
                        (e_loc,) + arrays["label"].shape[1:], np.float32
                    )
                    l_lm = np.zeros(
                        (e_loc,) + arrays["label_mask"].shape[1:], np.float32
                    )
                    l_lab[:n] = arrays["label"][idx]
                    l_lm[:n] = arrays["label_mask"][idx]
                    local[k]["label"] = l_lab
                    local[k]["label_mask"] = l_lm
                origin = np.full(e_loc, -1, np.int32)
                origin[:n] = idx
                local[k][f"edge_origin_{a.name}"] = origin
                label_pad = e_loc
            local[k][f"src_{a.name}"] = l_src
            local[k][f"dst_{a.name}"] = l_dst
            local[k][f"seq_{a.name}"] = l_seq
            local[k][f"edge_mask_{a.name}"] = l_mask
            if l_par is not None:
                local[k][f"params_{a.name}"] = l_par

            # local CSR companions: ONLY the index-free ones (row_ptr/lens)
            # — the slice/dense/source-sorted fast paths would gather from
            # halo rows whose empty-slot sentinel is not a zero row, so the
            # builder's generic sorted paths are used under v2
            aux = adjacency_aux_arrays(
                l_src, l_dst, l_mask, ext, b_dst, meta.maxlen(a.name)
            )
            local[k][f"row_ptr_{a.name}"] = aux["row_ptr"]
            local[k][f"lens_{a.name}"] = aux["lens"]

            if use_halo:
                send = np.zeros((n_model, h), np.int32)
                for dest in range(n_model):
                    rows = need[dest][k] if dest != k else None
                    if rows is not None and rows.size:
                        send[dest, : rows.size] = rows - k * b_src
                local[k][f"halo_send_{a.name}"] = send

        # interleave companions are global/per-graph: pass through replicated
    for key in arrays:
        if key.startswith("interleave_perm_"):
            for k in range(n_model):
                local[k][key] = arrays[key]

    stacked = {
        key: np.stack([local[k][key] for k in range(n_model)], 0)
        for key in local[0]
    }
    local_meta = BatchMeta(
        num_graphs=meta.num_graphs,
        node_pad=tuple((e.name, block[e.name]) for e in entities),
        edge_pad=tuple(sorted(edge_pad.items())),
        max_len=meta.max_len,
        interleave_len=meta.interleave_len,
        label_pad=label_pad,
        extra_layout=meta.extra_layout,
        extra_pad=meta.extra_pad,
    )
    return stacked, local_meta


# --------------------------------------------------------------------------
# sharded step builders
# --------------------------------------------------------------------------


def make_edgeshard_train_step(
    model: GnnModel,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    local_meta: BatchMeta,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
) -> Callable:
    """SPMD train step over destination-sharded batches.

    Expects arrays shaped [n_data, n_model, ...] (stack partition_batch
    outputs along a leading data axis; with one data shard use [1, n_model,
    ...]). Gradients psum over both axes through shard_map's replicated-
    cotangent semantics; the local loss is scaled by 1/n_data and node-domain
    label losses combine as mask-weighted means over the model axis (the
    exact global mean).
    """
    n_data = mesh.shape.get(data_axis, 1) if data_axis else 1
    label_dom = infer_label_domain(model.ir)
    reduction = loss_reduction(loss_fn)

    def local_loss(params, stacked_local, key):
        batch = {k: v[0, 0] for k, v in stacked_local.items()}
        # one replicated dropout key for every shard (see steps.py: the key
        # must not vary across model shards; mask patterns repeat per block)
        preds = model.apply(
            params, batch, local_meta, training=True, node_axis=model_axis,
            rng=key,
        )
        if getattr(loss_fn, "takes_axis_names", False):
            # hinge-family: the all-binary label predicate must span the
            # whole effective batch, not each shard's slice (losses.py)
            axes = tuple(a for a in (data_axis, model_axis) if a)
            loss = loss_fn(batch["label"], preds, batch["label_mask"],
                           axis_names=axes)
        else:
            loss = loss_fn(batch["label"], preds, batch["label_mask"])
        if label_dom[0] in ("entity", "edge"):
            if reduction == "sum":
                # sum-reduction losses (keras KLDivergence): the global
                # loss is the plain sum of the shard sums
                loss = jax.lax.psum(loss, model_axis)
            else:
                # sharded rows: the exact global mean is the mask-weighted
                # combination of the local masked means
                cnt = jnp.sum(batch["label_mask"])
                loss = jax.lax.psum(loss * cnt, model_axis) / jnp.maximum(
                    jax.lax.psum(cnt, model_axis), 1.0
                )
        else:
            # graph-domain: predictions are psum'd pooling -> every shard
            # computed the SAME loss from its replicated label copy, but the
            # label entered through sharded in_specs so vma marks it varying
            # — pmean is value-preserving and re-marks the loss replicated
            loss = jax.lax.pmean(loss, model_axis)
        reg = model.regularization_loss(params)
        # replicated-cotangent psum over the data axis sums shard gradients;
        # mean losses scale by 1/n_data so that sum IS the data-batch mean,
        # sum losses want the plain sum (scale 1); reg counts once either way
        scale = 1.0 if reduction == "sum" else 1.0 / n_data
        return loss * scale + reg / n_data, loss

    def step(params, opt_state, stacked, key):
        (_, loss), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, stacked, key
        )
        if data_axis:
            # also marks the loss replicated over the data axis
            if reduction == "sum":
                loss = jax.lax.psum(loss, data_axis)
            else:
                loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    cache: Dict[Tuple, Callable] = {}

    def train_step(params, opt_state, stacked_batch, rng=None):
        # rng: per-step dropout key (callers without dropout may omit it)
        if rng is None:
            from .steps import _warn_constant_rng

            _warn_constant_rng(model)
            rng = jax.random.PRNGKey(0)
        stacked_batch = {
            k: v for k, v in stacked_batch.items()
            if not k.startswith("edge_origin_")  # host-side reassembly data
        }
        key = tuple(sorted((k, np.shape(v)) for k, v in stacked_batch.items()))
        if key not in cache:
            in_specs = {
                k: P(data_axis, model_axis) for k in stacked_batch
            }
            cache[key] = jax.jit(
                shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(P(), P(), in_specs, P()),
                    out_specs=(P(), P(), P()),
                )
            )
        if jax.process_count() > 1:
            # multi-host pod: each process holds its local slice of the
            # 'data' axis (the 'model' axis stays within the host's local
            # devices, distributed.make_pod_mesh) — assemble global arrays
            # before the jitted sharded step, like steps.py
            from .steps import _globalize, _globalize_replicated

            specs = {k: P(data_axis, model_axis) for k in stacked_batch}
            stacked_batch = _globalize(stacked_batch, mesh, specs)
            params = _globalize_replicated(params, mesh)
            opt_state = _globalize_replicated(opt_state, mesh)
            rng = _globalize_replicated(rng, mesh)
        return cache[key](params, opt_state, stacked_batch, rng)

    return train_step


def make_edgeshard_apply(
    model: GnnModel,
    local_meta: BatchMeta,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
) -> Callable:
    """Sharded forward. Node-domain predictions all_gather back to the global
    padded row order (shard blocks are contiguous row ranges).

    Edge-domain predictions are reassembled HOST-side through
    `edge_origin_{adj}` (a numpy scatter over the fetched global output) and
    return the REAL-edge prefix — shape [n_data, n_real_edges, ...], not the
    padded label_pad rows other domains return (padding edges have no origin
    row). This host pass requires the full output locally, so multi-process
    (pod) inference on edge-domain models is rejected with a clear error —
    train multi-host, then predict single-process (the trained params are
    replicated)."""
    label_dom = infer_label_domain(model.ir)

    def fwd(params, stacked_local):
        batch = {k: v[0, 0] for k, v in stacked_local.items()}
        preds = model.apply(params, batch, local_meta, node_axis=model_axis)
        return preds[None]

    cache: Dict[Tuple, Callable] = {}

    def apply_fn(params, stacked_batch):
        origin = None
        if label_dom[0] == "edge":
            if jax.process_count() > 1:
                raise EdgeShardError(
                    "edge-domain prediction reassembly is host-side and "
                    "needs the full global output on one process; run "
                    "inference for edge-domain models single-process "
                    "(multi-host TRAINING of edge-domain models is supported)"
                )
            origin = np.asarray(stacked_batch[f"edge_origin_{label_dom[1]}"])
            stacked_batch = {
                k: v for k, v in stacked_batch.items()
                if not k.startswith("edge_origin_")
            }
        key = tuple(sorted((k, np.shape(v)) for k, v in stacked_batch.items()))
        if key not in cache:
            in_specs = {k: P(data_axis, model_axis) for k in stacked_batch}
            cache[key] = jax.jit(
                shard_map(
                    fwd,
                    mesh=mesh,
                    in_specs=(P(), in_specs),
                    # shard blocks are contiguous global row ranges, so
                    # concatenating local predictions along the row axis IS
                    # the global padded row order
                    out_specs=P(data_axis, model_axis),
                )
            )
        out = cache[key](params, stacked_batch)
        if label_dom[0] == "graph":
            # every shard computed the same [num_graphs] vector (pooled
            # values psum); the concat stacked n_model copies — keep one
            out = out[:, : local_meta.num_graphs]
        elif origin is not None:
            # edge-domain predictions come back per shard in LOCAL edge
            # order; scatter through edge_origin back to the merged batch's
            # destination-sorted edge order (real edges are a prefix there,
            # so origin covers [0, n_real)). Keeps any trailing feature
            # dims (predict heads with units > 1).
            o = np.asarray(out)  # [n_data, n_model*e_loc, *feat]
            flat_origin = origin.reshape(origin.shape[0], -1)
            assert o.shape[1] == flat_origin.shape[1], (
                f"prediction rows {o.shape[1]} != edge rows "
                f"{flat_origin.shape[1]}"
            )
            n_glob = int(origin.max()) + 1
            res = np.zeros((origin.shape[0], n_glob) + o.shape[2:], o.dtype)
            for d in range(origin.shape[0]):
                valid = flat_origin[d] >= 0
                res[d, flat_origin[d][valid]] = o[d][valid]
            out = res
        return out

    return apply_fn


def halo_fractions(
    stacked: Dict[str, np.ndarray], model_ir
) -> Dict[str, Dict[str, float]]:
    """Interior/boundary edge accounting of a partitioned batch: the fraction
    of real edges whose aggregation can proceed while the halo all_to_all is
    in flight (the overlap structure, builder._halo_gather). Adjacencies
    without a halo are fully interior."""
    out = {}
    for a in model_ir.adjacency_info():
        em = stacked[f"edge_mask_{a.name}"]
        real = float(em.sum())
        im = stacked.get(f"interior_emask_{a.name}")
        interior = real if im is None else float(im.sum())
        out[a.name] = {
            "real_edges": real,
            "interior_edges": interior,
            "boundary_edges": real - interior,
            "boundary_frac": (real - interior) / real if real else 0.0,
        }
    return out


# --------------------------------------------------------------------------
# analytic comm accounting (docs/scaling.md)
# --------------------------------------------------------------------------


def comm_bytes_per_step(
    model_ir,
    meta: BatchMeta,
    stacked: Dict[str, np.ndarray],
    n_model: int,
    dtype_bytes: int = 4,
) -> Dict[str, Dict[str, float]]:
    """Analytic per-shard collective volume per training step: v1 full-psum
    vs v2 halo, per adjacency. psum counts 2x (reduce-scatter + all-gather
    equivalent); all_to_all counts its send volume once."""
    state_dims = model_ir.state_dims()
    iters = model_ir.num_iterations
    out = {}
    for a in model_ir.adjacency_info():
        d = state_dims[a.dst]
        d_src = state_dims[a.src]
        n_dst = meta.nodes(a.dst)
        v1 = 2 * n_dst * d * dtype_bytes * iters  # full [n_dst, D] psum
        key = f"halo_send_{a.name}"
        if key in stacked:
            h = stacked[key].shape[-1]
            v2 = n_model * h * d_src * dtype_bytes * iters
        else:
            v2 = 0.0
        out[a.name] = {
            "v1_full_psum_bytes": float(v1),
            "v2_halo_bytes": float(v2),
            "ratio": float(v2 / v1) if v1 else 0.0,
        }
    return out
