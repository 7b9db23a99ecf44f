"""Locality-aware renumbering (parallel/locality.py).

The model is permutation-equivariant over each entity's rows, so a
renumbered sample must produce the SAME graph: identical losses/gradients,
predictions permuted by the label entity's order, and — the point — fewer
block-boundary edges under the v2 contiguous-block partitioner."""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.dataset import AdjacencyArrays, GraphSample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build
from ignnition_tpu.parallel.edgeshard import (
    halo_fractions, make_edgeshard_train_step, partition_batch,
)
from ignnition_tpu.parallel.locality import (
    boundary_edge_count, locality_order, reorder_sample,
)
from ignnition_tpu.data.synthetic import make_routenet_sample
from ignnition_tpu.training import build_optimizer, get_loss

from helpers import qsize_description, routenet_description

DIMS = {"link_capacity": 1, "traffic": 1, "queue_sizes": 1,
        "adj_links_paths": 0, "adj_paths_links": 0}


def _routenet(seed=5, n_links=24, n_paths=18):
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8), dict(DIMS)
    )
    rng = np.random.default_rng(seed)
    raw = make_routenet_sample(rng, n_links, n_paths, 5)
    return ir, convert_sample(raw, SampleSpec.from_ir(ir))


def _loss_and_preds(ir, sample):
    arrays, meta = build_batch([sample], ir)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = get_loss(ir.learning.loss)

    def loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"])

    l, g = jax.value_and_grad(loss)(params)
    preds = model.apply(params, arrays, meta)
    return float(l), g, np.asarray(preds), meta


def test_reorder_prediction_loss_grad_parity():
    ir, sample = _routenet()
    l0, g0, p0, _ = _loss_and_preds(ir, sample)
    re, orders = reorder_sample(sample, ir, n_model=2)
    l1, g1, p1, _ = _loss_and_preds(ir, re)
    # loss and gradients are permutation-invariant
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        g0, g1,
    )
    # predictions come back in the new row order: new row j = old order[j]
    n = sample.num_nodes["path"]
    np.testing.assert_allclose(
        p1[:n], p0[orders["path"][:n]], rtol=1e-5, atol=1e-6
    )


def test_reorder_qsize_interleave_parity():
    """3 entities + interleave aggregation: seq/interleave companions must
    survive the renumbering untouched."""
    ir = parser.parse_model_description(
        qsize_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1, "queue_sizes": 1},
    )
    rng = np.random.default_rng(9)
    raw = make_routenet_sample(rng, 14, 10, 4, with_nodes=True)
    sample = convert_sample(raw, SampleSpec.from_ir(ir))
    l0, g0, p0, _ = _loss_and_preds(ir, sample)
    re, orders = reorder_sample(sample, ir, n_model=2)
    l1, g1, p1, _ = _loss_and_preds(ir, re)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    n = sample.num_nodes["path"]
    np.testing.assert_allclose(
        p1[:n], p0[orders["path"][:n]], rtol=1e-5, atol=1e-6
    )


def test_partitioned_loss_matches_serial_after_reorder():
    """Reorder -> build -> partition m=2: sharded loss equals the ORIGINAL
    sample's serial loss (exactness through the whole v2 pipeline)."""
    ir, sample = _routenet(seed=7)
    l0, _, _, _ = _loss_and_preds(ir, sample)
    re, _ = reorder_sample(sample, ir, n_model=2)
    arrays, meta = build_batch([re], ir)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    opt = build_optimizer(ir.learning.optimizer)
    loss_fn = get_loss(ir.learning.loss)
    stacked, local_meta = partition_batch(arrays, meta, ir, 2)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    _, _, loss = step(params, opt.init(params), {
        k: v[None] for k, v in stacked.items()
    })
    np.testing.assert_allclose(float(loss), l0, rtol=1e-5)


def _window_graph(n_links, n_paths, path_len, window, shuffle, seed=0):
    """Latent-local bipartite incidence (paths draw links from a window),
    optionally with SCRAMBLED ids — the deployment case the partitioner must
    recover."""
    rng = np.random.default_rng(seed)
    anchors = np.sort(rng.integers(0, n_links, n_paths))
    offs = rng.integers(-window, window + 1, (n_paths, path_len))
    links = (anchors[:, None] + offs) % n_links
    if shuffle:
        links = rng.permutation(n_links)[links]
        links = links[rng.permutation(n_paths)]
    src_lp = links.reshape(-1).astype(np.int32)
    dst_lp = np.repeat(np.arange(n_paths, dtype=np.int32), path_len)
    seq_lp = np.tile(np.arange(path_len, dtype=np.int32), n_paths)
    order = np.argsort(src_lp, kind="stable")
    src_pl, dst_pl = dst_lp[order].copy(), src_lp[order].copy()
    counts = np.bincount(dst_pl, minlength=n_links)
    seq_pl = np.concatenate(
        [np.arange(c, dtype=np.int32) for c in counts]
    ) if counts.sum() else np.empty(0, np.int32)
    return GraphSample(
        num_nodes={"link": n_links, "path": n_paths},
        features={
            "link_capacity": rng.uniform(20, 40, (n_links, 1)).astype(np.float32),
            "traffic": rng.uniform(0.2, 0.8, (n_paths, 1)).astype(np.float32),
        },
        adjacencies={
            "adj_links_paths": AdjacencyArrays(src_lp, dst_lp, seq_lp),
            "adj_paths_links": AdjacencyArrays(src_pl, dst_pl, seq_pl),
        },
        label=rng.uniform(0.1, 1.0, n_paths).astype(np.float32),
    )


@pytest.mark.parametrize("m", [2, 4])
def test_recovers_latent_locality(m):
    """A scrambled windowed graph partitions near-worst naively; the
    partitioner must recover most of the latent cut."""
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8), dict(DIMS)
    )
    s = _window_graph(256, 1024, 8, window=16, shuffle=True, seed=3)
    ident = {"link": np.arange(256), "path": np.arange(1024)}
    naive = boundary_edge_count(s, ir, ident, m)["adj_links_paths"]
    orders = locality_order(s, ir, n_model=m)
    re = boundary_edge_count(s, ir, orders, m)["adj_links_paths"]
    assert naive > 0.4, f"scrambled layout should cut badly, got {naive}"
    assert re < 0.5 * naive, f"m={m}: {naive:.2%} -> {re:.2%} (not enough)"


def test_never_worse_than_input_order():
    """An already-well-numbered graph must not get worse (the identity
    candidate guard)."""
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8), dict(DIMS)
    )
    s = _window_graph(256, 1024, 8, window=16, shuffle=False, seed=4)
    ident = {"link": np.arange(256), "path": np.arange(1024)}
    for m in (2, 4):
        naive = sum(boundary_edge_count(s, ir, ident, m).values())
        orders = locality_order(s, ir, n_model=m)
        re = sum(boundary_edge_count(s, ir, orders, m).values())
        assert re <= naive + 1e-9, f"m={m}: {naive} -> {re}"


def test_halo_shrinks_after_reorder():
    """End-to-end: partition_batch's measured boundary fractions and halo
    table heights shrink under the reordering (what the dryrun prints)."""
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8), dict(DIMS)
    )
    s = _window_graph(128, 512, 6, window=12, shuffle=True, seed=6)
    arrays0, meta0 = build_batch([s], ir)
    node_pad = {e.name: meta0.nodes(e.name) for e in ir.entities}
    orders = locality_order(s, ir, n_model=2, node_pad=node_pad)
    re, _ = reorder_sample(s, ir, orders=orders)
    arrays1, meta1 = build_batch([re], ir)
    st0, _ = partition_batch(arrays0, meta0, ir, 2)
    st1, _ = partition_batch(arrays1, meta1, ir, 2)
    f0 = halo_fractions(st0, ir)
    f1 = halo_fractions(st1, ir)
    for adj in f0:
        assert f1[adj]["boundary_frac"] < f0[adj]["boundary_frac"], adj
    h0 = sum(v.shape[-1] for k, v in st0.items() if k.startswith("halo_send_"))
    h1 = sum(v.shape[-1] for k, v in st1.items() if k.startswith("halo_send_"))
    assert h1 < h0, f"halo height {h0} -> {h1}"


def test_reorder_threads_extras_and_edge_labels():
    """Edge-domain labels stay edge-aligned and entity-shaped extras permute
    with their entity (the edge-domain readout smoke model)."""
    desc = routenet_description(num_iterations=2, hs=8)
    desc["readout"] = [
        {"type": "product", "type_product": "element_wise",
         "input": ["path", "path_weights"], "output_name": "pw"},
        {"type": "extend_adjacencies", "adj_list": "adj_links_paths",
         "input": ["link", "pw"],
         "output_name_src": "esrc", "output_name_dst": "edst"},
        {"type": "product", "type_product": "element_wise",
         "input": ["esrc", "edst"], "output_name": "pair"},
        {"type": "predict", "input": ["pair"], "label": "edge_label",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(desc, dict(DIMS))
    rng = np.random.default_rng(13)
    raw = make_routenet_sample(rng, 16, 12, 4)
    n_edges = sum(len(v) for v in raw["adj_links_paths"].values())
    raw["edge_label"] = rng.uniform(0.1, 1.0, n_edges).round(3).tolist()
    n_paths = sum(1 for t in raw["entities"].values() if t == "path")
    raw["path_weights"] = rng.uniform(0.5, 2.0, n_paths).round(3).tolist()
    sample = convert_sample(raw, SampleSpec.from_ir(ir))

    l0, g0, _, _ = _loss_and_preds(ir, sample)
    re, _ = reorder_sample(sample, ir, n_model=2)
    l1, g1, _, _ = _loss_and_preds(ir, re)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        g0, g1,
    )


def test_ambiguous_extra_skips_reordering():
    """Review regression: a sample whose additional readout input matches
    the node counts of SEVERAL entities cannot know which one build_batch
    will resolve batch-wide — such samples must pass through unreordered
    (identity orders) instead of guessing and permuting the rows by the
    wrong entity's order."""
    import copy

    from ignnition_tpu.parallel.locality import reorder_sample

    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"][0]["input"] = ["path", "extra_in"]
    ir = parser.parse_model_description(
        copy.deepcopy(desc),
        {"link_capacity": 1, "traffic": 1, "extra_in": 1},
    )
    rng = np.random.default_rng(0)
    # n_links == n_paths -> the extra's row count matches BOTH entities
    raw = make_routenet_sample(rng, n_links=9, n_paths=9)
    raw["extra_in"] = rng.uniform(0, 1, 9).tolist()
    spec = SampleSpec.from_ir(ir)
    s = convert_sample(raw, spec)
    out, orders = reorder_sample(s, ir, n_model=2)
    for ent, o in orders.items():
        np.testing.assert_array_equal(o, np.arange(len(o)))
    np.testing.assert_array_equal(out.extras["extra_in"], s.extras["extra_in"])
    np.testing.assert_array_equal(
        out.features["traffic"], s.features["traffic"]
    )

    # unambiguous case still reorders
    raw2 = make_routenet_sample(rng, n_links=7, n_paths=9)
    raw2["extra_in"] = rng.uniform(0, 1, 9).tolist()
    s2 = convert_sample(raw2, spec)
    out2, orders2 = reorder_sample(s2, ir, n_model=2)
    np.testing.assert_array_equal(
        out2.extras["extra_in"], np.asarray(s2.extras["extra_in"])[orders2["path"]]
    )
