"""Interior/boundary split of the v2 halo exchange (SURVEY §2.4 item 2:
boundary exchange "overlapped with local segment-sum aggregation").

The overlap structure (builder._halo_gather) must be EXACT: the masked
interior pass (local pre-halo block) plus the masked boundary pass
(received halo rows only) equals the synchronous extend-then-gather, for
forwards AND gradients, across aggregation kinds."""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build
from ignnition_tpu.model import builder as builder_mod
from ignnition_tpu.parallel.edgeshard import (
    halo_fractions, make_edgeshard_train_step, partition_batch,
)
from ignnition_tpu.training import build_optimizer, get_loss

from helpers import routenet_description

DIMS = {"link_capacity": 1, "traffic": 1,
        "adj_links_paths": 0, "adj_paths_links": 0}


def _case(agg_kind, seed=11, n_link=12, n_path=10):
    desc = routenet_description(num_iterations=2, hs=8)
    desc["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = (
        {"type": agg_kind} if agg_kind != "concat"
        else {"type": "concat", "concat_axis": 1}
    )
    ir = parser.parse_model_description(copy.deepcopy(desc), dict(DIMS))
    r = np.random.RandomState(seed)
    entities = {f"l{i}": "link" for i in range(n_link)}
    entities.update({f"p{i}": "path" for i in range(n_path)})
    adj_lp = {}
    inv = {f"l{i}": [] for i in range(n_link)}
    for p in range(n_path):
        links = r.choice(n_link, size=r.randint(2, 5), replace=False)
        adj_lp[f"p{p}"] = [f"l{i}" for i in links]
        for i in links:
            inv[f"l{i}"].append(f"p{p}")
    sample = {
        "entities": entities,
        "link_capacity": r.rand(n_link).tolist(),
        "traffic": r.rand(n_path).tolist(),
        "delay": r.rand(n_path).tolist(),
        "adj_links_paths": adj_lp,
        "adj_paths_links": {k: v for k, v in inv.items() if v},
    }
    arrays, meta = build_batch([convert_sample(sample, SampleSpec.from_ir(ir))], ir)
    return ir, arrays, meta


def _sharded_losses(ir, arrays, meta, m, overlap, steps=2):
    builder_mod._HALO_OVERLAP = overlap
    try:
        model = build(ir)
        params = model.init(jax.random.PRNGKey(0))
        opt = build_optimizer(ir.learning.optimizer)
        loss = get_loss(ir.learning.loss)
        stacked, local_meta = partition_batch(arrays, meta, ir, m)
        stacked = {k: v[None] for k, v in stacked.items()}
        devices = np.array(jax.devices()[:m]).reshape(1, m)
        mesh = Mesh(devices, ("data", "model"))
        step = make_edgeshard_train_step(model, opt, loss, local_meta, mesh)
        opt_state = opt.init(params)
        out = []
        for _ in range(steps):
            params, opt_state, l = step(params, opt_state, stacked)
            out.append(float(l))
        return out
    finally:
        builder_mod._HALO_OVERLAP = True


@pytest.mark.parametrize("agg", ["sum", "attention", "convolution"])
@pytest.mark.parametrize("m", [2, 4])
def test_overlap_matches_synchronous(agg, m):
    ir, arrays, meta = _case(agg)
    on = _sharded_losses(ir, arrays, meta, m, overlap=True)
    off = _sharded_losses(ir, arrays, meta, m, overlap=False)
    np.testing.assert_allclose(on, off, rtol=1e-6, atol=1e-7,
                               err_msg=f"{agg} m={m}")


def test_masks_partition_real_edges():
    """interior + boundary masks == edge_mask exactly, disjointly, on every
    shard; the halo fractions helper agrees."""
    ir, arrays, meta = _case("sum")
    stacked, _ = partition_batch(arrays, meta, ir, 2)
    for a in ir.adjacency_info():
        if f"interior_emask_{a.name}" not in stacked:
            continue  # no halo: every edge interior, no masks emitted
        im = stacked[f"interior_emask_{a.name}"]
        bm = stacked[f"boundary_emask_{a.name}"]
        em = stacked[f"edge_mask_{a.name}"]
        np.testing.assert_array_equal(im + bm, em)
        assert np.all(im * bm == 0)
    fr = halo_fractions(stacked, ir)
    for adj, row in fr.items():
        assert 0.0 <= row["boundary_frac"] <= 1.0
        assert row["interior_edges"] + row["boundary_edges"] == row["real_edges"]


def test_ordered_stage_exact_under_overlap():
    """The ordered (sequence) stage also rides the split message gather."""
    ir, arrays, meta = _case("sum", seed=23)
    on = _sharded_losses(ir, arrays, meta, 2, overlap=True, steps=3)
    off = _sharded_losses(ir, arrays, meta, 2, overlap=False, steps=3)
    np.testing.assert_allclose(on, off, rtol=1e-6, atol=1e-7)
