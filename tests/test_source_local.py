"""Source-local message chains (MLP of hs_source only) run per NODE and ride
every direct-assignation fast path: dense incidence matmul, fused segment
sums, the slice-gather ordered update, dense GAT/GCN.

Parity is checked two ways per model:
  * vs the per-edge formulation (is_source_local monkeypatched to False,
    which forces the original gather -> per-edge MLP path);
  * vs the stripped batch (fast-path companion arrays removed, forcing the
    fallback segment ops on node-table-gathered messages).
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data import graph as G
from ignnition_tpu.frontend import ir as IR
from ignnition_tpu.frontend.parser import parse_model_description
from ignnition_tpu.model import build
from tests.helpers import dense, routenet_description

HS = 8

MSG_NN = {
    "nn_name": "src_msg",
    "nn_type": "feed_forward",
    "nn_architecture": [dense(HS, "relu"), dense(HS, None)],
}

_FAST_PREFIXES = (
    "dense_inc_",
    "slice_src_",
    "bwd_slice_dst_",
    "dst_in_src_order_",
    "emask_src_order_",
    "src_sorted_",
    "src_row_ptr_",
    "out_lens_",
)


def _strip(arrays):
    return {
        k: v
        for k, v in arrays.items()
        if not any(k.startswith(p) for p in _FAST_PREFIXES)
    }


def _description(stage2_agg):
    """RouteNet shape with MLP(hs_source) messages on BOTH stages; stage2
    aggregation configurable (sum / attention / convolution)."""
    d = routenet_description(num_iterations=2, hs=HS)
    d["neural_networks"].append(copy.deepcopy(MSG_NN))
    msg = [{"type": "neural_network", "nn_name": "src_msg", "input": ["hs_source"]}]
    for stage in d["message_passing"]["stages"]:
        for mp in stage["stage_mp"]:
            for se in mp["source_entities"]:
                se["message"] = copy.deepcopy(msg)
    d["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = dict(
        stage2_agg
    )
    return d


def _random_samples(rng, n=3):
    out = []
    for _ in range(n):
        n_links = int(rng.integers(4, 8))
        n_paths = int(rng.integers(3, 6))
        entities = {f"l{i}": "link" for i in range(n_links)}
        entities.update({f"p{i}": "path" for i in range(n_paths)})
        adj_lp = {}
        adj_pl = {f"l{i}": [] for i in range(n_links)}
        for p in range(n_paths):
            hops = rng.choice(n_links, size=int(rng.integers(2, 4)), replace=False)
            adj_lp[f"p{p}"] = [f"l{h}" for h in hops]
            for h in hops:
                adj_pl[f"l{h}"].append(f"p{p}")
        out.append(
            {
                "entities": entities,
                "link_capacity": [float(rng.uniform(1, 5)) for _ in range(n_links)],
                "traffic": [float(rng.uniform(0.1, 1)) for _ in range(n_paths)],
                "delay": [float(rng.uniform(0.1, 2)) for _ in range(n_paths)],
                "adj_links_paths": adj_lp,
                "adj_paths_links": {k: v for k, v in adj_pl.items() if v},
            }
        )
    return out


DIMS = {"link_capacity": 1, "traffic": 1}


def _mk(stage2_agg, seed=0):
    model_ir = parse_model_description(_description(stage2_agg), DIMS)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(seed + 17)
    samples = [convert_sample(s, spec) for s in _random_samples(rng)]
    arrays, meta = build_batch(samples, model_ir)
    return model_ir, model, params, arrays, meta


AGGS = [
    {"type": "sum"},
    {"type": "attention"},
    {"type": "convolution", "activation": "relu"},
]


def test_is_source_local_predicate():
    mlp = IR.MessageOpSpec(kind="mlp", inputs=("hs_source",))
    assert IR.is_source_local((IR.MessageOpSpec(kind="direct"),))
    assert IR.is_source_local((mlp,))
    assert IR.is_source_local((IR.MessageOpSpec(kind="direct"), mlp))
    # hs_dest / edge_params / named inputs / named outputs disqualify
    for bad in (
        IR.MessageOpSpec(kind="mlp", inputs=("hs_source", "hs_dest")),
        IR.MessageOpSpec(kind="mlp", inputs=("edge_params",)),
        IR.MessageOpSpec(kind="mlp", inputs=("m1",)),
        IR.MessageOpSpec(kind="mlp", inputs=("hs_source",), output_name="m1"),
    ):
        assert not IR.is_source_local((bad,))


def test_dense_inc_emitted_for_mlp_source_messages():
    model_ir, _, _, arrays, _ = _mk({"type": "sum"})
    assert "adj_paths_links" in G.dense_agg_adjacencies(model_ir)
    assert "dense_inc_adj_paths_links" in arrays


@pytest.mark.parametrize("agg", AGGS, ids=[a["type"] for a in AGGS])
def test_node_table_matches_per_edge_formulation(agg, monkeypatch):
    model_ir, model, params, arrays, meta = _mk(agg)
    fast = model.apply(params, arrays, meta)

    def loss(p, b):
        return jnp.sum(model.apply(p, b, meta) ** 2)

    g_fast = jax.grad(loss)(params, arrays)

    # force the original per-edge message path (gather -> per-edge MLP)
    monkeypatch.setattr(IR, "is_source_local", lambda ops: False)
    ref = model.apply(params, _strip(arrays), meta)
    g_ref = jax.grad(loss)(params, _strip(arrays))

    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


@pytest.mark.parametrize("agg", AGGS, ids=[a["type"] for a in AGGS])
def test_node_table_matches_stripped_fallback(agg):
    """Companion-stripped batch (fallback segment ops on gathered node-table
    messages) equals the fast paths."""
    _, model, params, arrays, meta = _mk(agg, seed=3)
    fast = model.apply(params, arrays, meta)
    slow = model.apply(params, _strip(arrays), meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5
    )

    def loss(p, b):
        return jnp.sum(model.apply(p, b, meta) ** 2)

    g1 = jax.grad(loss)(params, arrays)
    g2 = jax.grad(loss)(params, _strip(arrays))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
