"""Re-padding correctness (incl. interleave permutation remapping) and
graph-domain prediction layouts."""

import jax
import numpy as np

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.graph import (
    PaddingConfig,
    infer_label_domain,
    merge_metas,
    repad_to_meta,
)
from ignnition_tpu.data.synthetic import make_routenet_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build

from helpers import routenet_description, qsize_description, dense


def test_repad_preserves_predictions_routenet():
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(3)
    s1 = convert_sample(make_routenet_sample(rng, 10, 6, 3), spec)
    s2 = convert_sample(make_routenet_sample(rng, 18, 14, 6), spec)
    a1, m1 = build_batch([s1], ir)
    a2, m2 = build_batch([s2], ir)
    target = merge_metas([m1, m2]) if m1 != m2 else m1
    r1 = repad_to_meta(a1, m1, target, ir)
    p_orig = np.asarray(model.apply(params, a1, m1))
    p_repad = np.asarray(model.apply(params, r1, target))
    n = int(a1["label_mask"].sum())
    np.testing.assert_allclose(p_repad[:n], p_orig[:n], rtol=1e-4, atol=1e-6)


def test_repad_interleave_permutations():
    ir = parser.parse_model_description(
        qsize_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1, "queue_sizes": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(4)
    # different path lengths -> different max_len -> interleave remap needed
    s1 = convert_sample(
        make_routenet_sample(rng, 10, 6, 3, with_nodes=True), spec
    )
    s2 = convert_sample(
        make_routenet_sample(rng, 14, 10, 6, with_nodes=True), spec
    )
    a1, m1 = build_batch([s1], ir)
    a2, m2 = build_batch([s2], ir)
    if m1 == m2:
        return  # nothing to remap; sizes collided
    target = merge_metas([m1, m2])
    r1 = repad_to_meta(a1, m1, target, ir)
    # the remapped permutation must still be a permutation
    perm = r1["interleave_perm_path_s0m0"]
    for g in range(perm.shape[0]):
        assert sorted(perm[g].tolist()) == list(range(perm.shape[1]))
    p_orig = np.asarray(model.apply(params, a1, m1))
    p_repad = np.asarray(model.apply(params, r1, target))
    n = int(a1["label_mask"].sum())
    np.testing.assert_allclose(p_repad[:n], p_orig[:n], rtol=1e-4, atol=1e-6)


def test_graph_domain_label_layout():
    """predict on a pooled (per-graph) tensor: labels align per graph."""
    d = routenet_description(num_iterations=1, hs=8)
    d["readout"] = [
        {"type": "pooling", "type_pooling": "mean", "input": ["path"],
         "output_name": "graph_emb"},
        {"type": "predict", "input": ["graph_emb"], "label": "total_delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(d, {"link_capacity": 1, "traffic": 1})
    assert infer_label_domain(ir) == ("graph", "")
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(5)
    samples = []
    for _ in range(3):
        raw = make_routenet_sample(rng, 8, 5, 3)
        raw["total_delay"] = float(np.sum(raw["delay"]))
        samples.append(convert_sample(raw, spec))
    arrays, meta = build_batch(samples, ir)
    assert arrays["label"].shape == (3,)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    preds = model.apply(params, arrays, meta)
    assert preds.shape == (3,)
    assert np.isfinite(np.asarray(preds)).all()


def test_repad_rebuilds_params_slice():
    """Growing a batch to a target meta must rebuild params_slice_{adj} at
    the target [max_len, n_dst, P] shape (review-found: stack_batches over
    variable-size graphs crashed on shape mismatch for edge-param slot
    models)."""
    import copy

    from helpers import routenet_description
    from ignnition_tpu.data.graph import merge_metas, repad_to_meta

    desc = routenet_description(num_iterations=2, hs=8)
    desc["neural_networks"].append({
        "nn_name": "msg", "nn_type": "feed_forward",
        "nn_architecture": [
            {"type_layer": "Dense", "units": 8, "activation": "relu"},
            {"type_layer": "Dense", "units": 8, "activation": "None"}]})
    for st in desc["message_passing"]["stages"]:
        for mp in st["stage_mp"]:
            for se in mp["source_entities"]:
                se["message"] = [{"type": "neural_network", "nn_name": "msg",
                                  "input": ["hs_source", "edge_params"]}]
    ir = parser.parse_model_description(copy.deepcopy(desc), {
        "link_capacity": 1, "traffic": 1,
        "adj_links_paths": 1, "adj_paths_links": 1,
    })
    spec = SampleSpec.from_ir(ir)
    r = np.random.RandomState(3)

    def sample(n_link, n_path):
        entities = {f"l{i}": "link" for i in range(n_link)}
        entities.update({f"p{i}": "path" for i in range(n_path)})
        adj, inv = {}, {}
        for p in range(n_path):
            links = r.choice(n_link, size=min(2, n_link), replace=False)
            adj[f"p{p}"] = [[f"l{i}", [float(r.rand())]] for i in links]
            for i in links:
                inv.setdefault(f"l{i}", []).append(
                    [f"p{p}", [float(r.rand())]])
        return {"entities": entities,
                "link_capacity": r.rand(n_link).tolist(),
                "traffic": r.rand(n_path).tolist(),
                "delay": r.rand(n_path).tolist(),
                "adj_links_paths": adj, "adj_paths_links": inv}

    small = build_batch([convert_sample(sample(4, 3), spec)], ir)
    big = build_batch([convert_sample(sample(14, 12), spec)], ir)
    assert "params_slice_adj_links_paths" in small[0]
    target = merge_metas([small[1], big[1]])
    re_small = repad_to_meta(small[0], small[1], target, ir)
    re_big = repad_to_meta(big[0], big[1], target, ir)
    for k in re_small:
        assert re_small[k].shape == re_big[k].shape, k
    # repadded slot layout stays consistent with the model: forward equal
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    base = np.asarray(model.apply(params, small[0], small[1]))
    re = np.asarray(model.apply(params, re_small, target))
    mask0 = np.asarray(small[0]["label_mask"]) > 0
    np.testing.assert_allclose(
        re[: len(base)][mask0], base[mask0], rtol=1e-5, atol=1e-6
    )


# --------------------------------------------------------------------------
# Round-4.2 review regressions (core-file adversarial review)
# --------------------------------------------------------------------------


def _pad4():
    return PaddingConfig(mode="multiple", multiple=4, min_size=4)


def test_nn_readout_domain_follows_first_nongraph_input():
    """infer_readout_domains must place a neural_network output where the
    builder evaluates it: the first NON-graph input's domain (graph-level
    operands broadcast). Regression: inputs[0] graph-level used to infer
    'graph', laying labels out per graph while predictions came out per
    path."""
    import copy

    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"] = [
        {"type": "pooling", "type_pooling": "sum", "input": ["path"],
         "output_name": "pooled"},
        {"type": "neural_network", "input": ["pooled", "path"],
         "nn_name": "readout_model", "output_name": "h"},
        {"type": "predict", "input": ["h"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(
        copy.deepcopy(desc), {"link_capacity": 1, "traffic": 1}
    )
    assert infer_label_domain(ir) == ("entity", "path")
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(0)
    s = convert_sample(make_routenet_sample(rng, 8, 10), spec)
    batch, meta = build_batch([s, s], ir, _pad4())
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    preds = model.apply(params, batch, meta)
    assert preds.shape == batch["label"].shape


def test_predict_domain_with_graph_first_input():
    """Same rule for the predict op itself: predict([pooled, path]) emits
    per-path rows, so labels must be entity-domain."""
    import copy

    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"] = [
        {"type": "pooling", "type_pooling": "mean", "input": ["path"],
         "output_name": "pooled"},
        {"type": "predict", "input": ["pooled", "path"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(
        copy.deepcopy(desc), {"link_capacity": 1, "traffic": 1}
    )
    assert infer_label_domain(ir) == ("entity", "path")


def test_stack_batches_repads_additional_inputs():
    """Entity-shaped additional readout inputs must grow with their entity's
    node padding when batches are stacked (regression: they were never
    repadded — np.stack crashed on differing node_pad)."""
    import copy

    from ignnition_tpu.parallel.steps import stack_batches

    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"] = [
        {"type": "predict", "input": ["path", "extra_in"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(
        copy.deepcopy(desc),
        {"link_capacity": 1, "traffic": 1, "extra_in": 1},
    )
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(0)

    def mk(n_links, n_paths):
        raw = make_routenet_sample(rng, n_links=n_links, n_paths=n_paths)
        raw["extra_in"] = rng.uniform(0, 1, n_paths).tolist()
        return convert_sample(raw, spec)

    bA = build_batch([mk(6, 7)], ir, _pad4())
    bB = build_batch([mk(12, 21)], ir, _pad4())
    arrays, meta = stack_batches([bA, bB], ir)
    assert arrays["extra_in"].shape == (2, dict(meta.node_pad)["path"])
    # batch A's real rows survive at their offsets
    np.testing.assert_allclose(
        arrays["extra_in"][0, :7], bA[0]["extra_in"][:7]
    )


def test_merged_interleave_len_matches_rebuilt_arrays():
    """merge_metas with model_ir derives the combined interleave length from
    the merged per-adjacency max_lens (regression: elementwise max of
    per-batch sums undershot what repad rebuilds when batches had swapped
    long/short blocks, leaving meta and arrays inconsistent)."""
    import copy

    from ignnition_tpu.parallel.steps import stack_batches

    qir = parser.parse_model_description(
        copy.deepcopy(qsize_description(num_iterations=1, hs=8)),
        {"link_capacity": 1, "traffic": 1, "queue_sizes": 1},
    )
    qspec = SampleSpec.from_ir(qir)

    def mkq(seed, link_hops, node_hops):
        r = np.random.default_rng(seed)
        n_links = n_nodes = 6
        n_paths = 3
        raw = {
            "entities": {},
            "link_capacity": r.uniform(20, 40, n_links).tolist(),
            "traffic": r.uniform(0.2, 0.8, n_paths).tolist(),
            "queue_sizes": r.uniform(2, 32, n_nodes).tolist(),
            "delay": r.uniform(0.1, 1, n_paths).tolist(),
            "path_interleave": ["link", "node"],
        }
        for i in range(n_links):
            raw["entities"][f"l{i}"] = "link"
        for i in range(n_nodes):
            raw["entities"][f"n{i}"] = "node"
        for i in range(n_paths):
            raw["entities"][f"p{i}"] = "path"
        alp = {f"p{p}": [f"l{i % n_links}" for i in range(link_hops)]
               for p in range(n_paths)}
        anp = {f"p{p}": [f"n{i % n_nodes}" for i in range(node_hops)]
               for p in range(n_paths)}
        apl, apn = {}, {}
        for p, ls in alp.items():
            for l in ls:
                apl.setdefault(l, []).append(p)
        for p, ns in anp.items():
            for n in ns:
                apn.setdefault(n, []).append(p)
        raw.update(adj_links_paths=alp, adj_nodes_paths=anp,
                   adj_paths_links=apl, adj_paths_nodes=apn)
        return convert_sample(raw, qspec)

    qA = build_batch([mkq(1, 2, 6)], qir, _pad4())
    qB = build_batch([mkq(2, 6, 2)], qir, _pad4())
    tgt = merge_metas([qA[1], qB[1]], qir)
    ml = dict(tgt.max_len)
    expect = ml["adj_links_paths"] + ml["adj_nodes_paths"]
    assert dict(tgt.interleave_len) == {"path_s0m0": expect}
    arrays, meta = stack_batches([qA, qB], qir)
    assert arrays["interleave_perm_path_s0m0"].shape[-1] == expect
    # stacked per-shard batches run (the fast-interleave companions were
    # rebuilt consistently with the merged meta)
    model = build(qir)
    params = model.init(jax.random.PRNGKey(0))
    for d in range(2):
        model.apply(params, {k: v[d] for k, v in arrays.items()}, meta)


def test_mixed_labeled_batch_is_a_friendly_error():
    import copy

    import pytest

    ir = parser.parse_model_description(
        copy.deepcopy(routenet_description(num_iterations=1, hs=8)),
        {"link_capacity": 1, "traffic": 1},
    )
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(0)
    import dataclasses

    s1 = convert_sample(make_routenet_sample(rng, 8, 10), spec)
    s2 = dataclasses.replace(
        convert_sample(make_routenet_sample(rng, 8, 10), spec), label=None
    )
    with pytest.raises(ValueError, match="no label"):
        build_batch([s1, s2], ir, _pad4())


def test_multivalue_graph_label_is_a_friendly_error():
    import copy

    import dataclasses

    import pytest

    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"] = [
        {"type": "pooling", "type_pooling": "sum", "input": ["path"],
         "output_name": "pooled"},
        {"type": "predict", "input": ["pooled"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(
        copy.deepcopy(desc), {"link_capacity": 1, "traffic": 1}
    )
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(0)
    s = convert_sample(make_routenet_sample(rng, 8, 10), spec)
    with pytest.raises(ValueError, match="one scalar per graph"):
        build_batch([s], ir, _pad4())
