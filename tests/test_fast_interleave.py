"""Fast interleave path: host-composed combined slice maps replace the
per-edge scatter + take_along_axis permutation for source-local message
chains with recurrent updates (graph.py interleave_slice_companions +
builder.py fast_ilv). Parity vs the scatter fallback and vs the per-edge
formulation on ragged multi-graph batches."""

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
from tests.helpers import dense, qsize_description

HS = 8
DIMS = {"link_capacity": 1, "traffic": 1, "queue_sizes": 1}


def _strip(arrays):
    return {k: v for k, v in arrays.items() if not k.startswith("ilv_")}


def _random_samples(rng, n=3):
    out = []
    for _ in range(n):
        n_links = int(rng.integers(3, 7))
        n_nodes = int(rng.integers(2, 5))
        n_paths = int(rng.integers(2, 5))
        entities = {f"l{i}": "link" for i in range(n_links)}
        entities.update({f"n{i}": "node" for i in range(n_nodes)})
        entities.update({f"p{i}": "path" for i in range(n_paths)})
        adj_lp, adj_np_ = {}, {}
        adj_pl = {f"l{i}": [] for i in range(n_links)}
        adj_pn = {f"n{i}": [] for i in range(n_nodes)}
        for p in range(n_paths):
            ls = rng.choice(n_links, size=int(rng.integers(1, n_links + 1)), replace=False)
            ns = rng.choice(n_nodes, size=int(rng.integers(1, n_nodes + 1)), replace=False)
            adj_lp[f"p{p}"] = [f"l{i}" for i in ls]
            adj_np_[f"p{p}"] = [f"n{i}" for i in ns]
            for i in ls:
                adj_pl[f"l{i}"].append(f"p{p}")
            for i in ns:
                adj_pn[f"n{i}"].append(f"p{p}")
        out.append(
            {
                "entities": entities,
                "link_capacity": [float(rng.uniform(1, 5)) for _ in range(n_links)],
                "queue_sizes": [float(rng.uniform(1, 8)) for _ in range(n_nodes)],
                "traffic": [float(rng.uniform(0.1, 1)) for _ in range(n_paths)],
                "delay": [float(rng.uniform(0.1, 2)) for _ in range(n_paths)],
                "adj_links_paths": adj_lp,
                "adj_nodes_paths": adj_np_,
                "adj_paths_links": {k: v for k, v in adj_pl.items() if v},
                "adj_paths_nodes": {k: v for k, v in adj_pn.items() if v},
                "path_interleave": ["link", "node"],
            }
        )
    return out


def _mk(seed=0, mlp_messages=False, n=3):
    d = qsize_description(num_iterations=2, hs=HS)
    if mlp_messages:
        d["neural_networks"].append(
            {
                "nn_name": "src_msg",
                "nn_type": "feed_forward",
                "nn_architecture": [dense(HS, "relu")],
            }
        )
        msg = [
            {"type": "neural_network", "nn_name": "src_msg", "input": ["hs_source"]}
        ]
        for se in d["message_passing"]["stages"][0]["stage_mp"][0]["source_entities"]:
            se["message"] = copy.deepcopy(msg)
    model_ir = parse_model_description(d, DIMS)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(seed + 29)
    samples = [convert_sample(s, spec) for s in _random_samples(rng, n)]
    arrays, meta = build_batch(samples, model_ir)
    return model_ir, model, params, arrays, meta


def test_companions_emitted_for_recurrent_interleave():
    _, _, _, arrays, _ = _mk()
    for k in ("ilv_slice_path_s0m0", "ilv_sort_perm_path_s0m0", "ilv_sort_ids_path_s0m0",
              "ilv_sort_row_ptr_path_s0m0"):
        assert k in arrays


@pytest.mark.parametrize("mlp_messages", [False, True], ids=["direct", "mlp"])
def test_fast_interleave_matches_scatter_fallback(mlp_messages):
    _, model, params, arrays, meta = _mk(mlp_messages=mlp_messages)
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


def test_fast_interleave_matches_per_edge_formulation(monkeypatch):
    """MLP messages forced down the per-edge path must agree."""
    _, model, params, arrays, meta = _mk(seed=2, mlp_messages=True)
    fast = model.apply(params, arrays, meta)
    monkeypatch.setattr(IR, "is_source_local", lambda ops: False)
    ref = model.apply(params, _strip(arrays), meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_repad_rebuilds_interleave_companions():
    model_ir, model, params, arrays, meta = _mk(seed=4, n=3)
    a2, m2 = _mk(seed=9, n=3)[3:5]
    target = G.merge_metas([meta, m2])
    r1 = G.repad_to_meta(arrays, meta, target, model_ir)
    # companions reshaped to the target layout
    t_out = dict(target.interleave_len)["path_s0m0"]
    n_dst = dict(target.node_pad)["path"]
    assert r1["ilv_slice_path_s0m0"].shape == (t_out, n_dst)
    # and predictions on the repadded batch equal the original ones
    p1 = model.apply(params, arrays, meta)
    p2 = model.apply(params, r1, target)
    real = np.asarray(arrays["label_mask"]) > 0
    np.testing.assert_allclose(
        np.asarray(p1)[: real.sum()], np.asarray(p2)[: real.sum()],
        rtol=1e-4, atol=1e-5,
    )


def _mk_agg(aggregation, seed=0, n=3):
    """Q-size-shaped model with stage1's aggregation swapped."""
    d = qsize_description(num_iterations=2, hs=HS)
    d["message_passing"]["stages"][0]["stage_mp"][0]["aggregation"] = dict(
        aggregation
    )
    model_ir = parse_model_description(d, DIMS)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(seed + 29)
    samples = [convert_sample(s, spec) for s in _random_samples(rng, n)]
    arrays, meta = build_batch(samples, model_ir)
    return model, params, arrays, meta


def _strip_slices(arrays):
    """Remove the slice companions so the scatter fallback runs."""
    return {
        k: v
        for k, v in arrays.items()
        if not k.startswith(("ilv_", "slice_src_", "slice_sort_", "row_ptr_"))
    }


@pytest.mark.parametrize(
    "agg",
    [
        {"type": "concat", "concat_axis": 1},
        {"type": "concat", "concat_axis": 2},
        {"type": "ordered"},  # multi-source ordered flat-concats blocks
    ],
    ids=["concat1", "concat2", "ordered-multi"],
)
def test_fast_concat_matches_scatter_fallback(agg):
    model, params, arrays, meta = _mk_agg(agg)
    fast = model.apply(params, arrays, meta)
    slow = model.apply(params, _strip_slices(arrays), meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5
    )

    def loss(p, b):
        return jnp.sum(model.apply(p, b, meta) ** 2)

    g1 = jax.grad(loss)(params, arrays)
    g2 = jax.grad(loss)(params, _strip_slices(arrays))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_multi_source_sum_decomposition_matches_fallback():
    """Multi-source sums decompose into per-source fused sums (dense
    incidence per adjacency); parity vs the plain segment-sum fallback."""
    model, params, arrays, meta = _mk_agg({"type": "sum"})
    assert "dense_inc_adj_links_paths" in arrays
    assert "dense_inc_adj_nodes_paths" in arrays
    fast = model.apply(params, arrays, meta)
    stripped = {
        k: v
        for k, v in arrays.items()
        if not k.startswith(("dense_inc_", "bwd_slice_dst_", "out_lens_",
                             "dst_in_src_order_", "emask_src_order_",
                             "src_sorted_", "src_row_ptr_", "row_ptr_"))
    }
    slow = model.apply(params, stripped, meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5
    )

    def loss(p, b):
        return jnp.sum(model.apply(p, b, meta) ** 2)

    g1 = jax.grad(loss)(params, arrays)
    g2 = jax.grad(loss)(params, stripped)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_interleave_gap_with_exact_fit_node_count():
    """Regression (found by the DSL fuzz): when a source entity's node count
    exactly filled its padding bucket, the fast interleave path's gap slots
    pointed at a REAL node's state instead of a masked zero row. The data
    layer now guarantees one masked padding row for interleave/concat
    source entities."""
    import jax
    import numpy as np

    from ignnition_tpu.data import SampleSpec, build_batch
    from ignnition_tpu.data.dataset import convert_sample
    from ignnition_tpu.frontend import parser
    from ignnition_tpu.model import build

    desc = {
        "entities": [
            {"name": "A", "hidden_state_dimension": 6,
             "features": [{"name": "f_A"}]},
            {"name": "B", "hidden_state_dimension": 6,
             "features": [{"name": "f_B"}]},
        ],
        "message_passing": {
            "num_iterations": 1,
            "stages": [{
                "stage_name": "s0",
                "stage_mp": [{
                    "destination_entity": "A",
                    "source_entities": [
                        {"name": "A", "adj_vector": "adj_AA",
                         "message": [{"type": "direct_assignation"}]},
                        {"name": "B", "adj_vector": "adj_BA",
                         "message": [{"type": "direct_assignation"}]},
                    ],
                    "aggregation": {"type": "interleave",
                                    "interleave_definition": "ilv"},
                    "update": {"type": "recurrent_neural_network",
                               "nn_name": "g"},
                }],
            }],
        },
        "readout": [{"type": "predict", "input": ["A"], "label": "y",
                     "nn_name": "ro"}],
        "neural_networks": [
            {"nn_name": "g", "nn_type": "recurrent_neural_network",
             "recurrent_type": "GRU"},
            {"nn_name": "ro", "nn_type": "feed_forward",
             "nn_architecture": [{"type_layer": "Dense", "units": 1}]},
        ],
        "learning_options": {
            "loss": "MeanSquaredError",
            "optimizer": {"type": "Adam", "learning_rate": 0.001},
        },
    }
    ir = parser.parse_model_description(desc, {"f_A": 1, "f_B": 1})
    spec = SampleSpec.from_ir(ir, training=False)
    r = np.random.default_rng(0)
    # 8 nodes of each entity = exactly the default pow2/min_size bucket;
    # a0 receives 3 A-messages (interleave slots 0,2,4) and ONE B-message
    # (slot 1) -> gap at slot 3 inside the masked length of 4
    raw = {
        "entities": {**{f"a{i}": "A" for i in range(8)},
                     **{f"b{i}": "B" for i in range(8)}},
        "f_A": r.uniform(-1, 1, 8).round(3).tolist(),
        "f_B": r.uniform(-1, 1, 8).round(3).tolist(),
        "adj_AA": {"a0": ["a1", "a2", "a3"]},
        "adj_BA": {"a0": ["b7"]},  # b7 = the would-be fake "padding" row
        "ilv": ["A", "B"],
    }
    s = convert_sample(raw, spec)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    arrays, meta = build_batch([s], ir, training=False)
    assert meta.nodes("A") > 8 and meta.nodes("B") > 8  # the guaranteed row
    fast = np.asarray(model.apply(params, arrays, meta))
    stripped = {
        k: v for k, v in arrays.items()
        if not any(k.startswith(p) for p in (
            "row_ptr_", "lens_", "src_perm_", "src_row_ptr_", "src_sorted_",
            "dst_in_src_order_", "emask_src_order_", "slice_src_",
            "slice_sort_", "dense_inc_", "inc_blocks_", "bwd_slice_dst_",
            "out_lens_", "ilv_slice", "ilv_sort",
        ))
    }
    slow = np.asarray(model.apply(params, stripped, meta))
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
