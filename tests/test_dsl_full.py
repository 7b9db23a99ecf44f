"""Full-DSL coverage: every aggregation, update, message-op and readout form
the reference supports, checked against dense numpy oracles or structural
invariants (reference semantics: auxilary_classes.py / generate_model.py)."""

import copy

import jax
import numpy as np
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build

import oracle
from helpers import TINY_SAMPLE, routenet_description, qsize_description, dense

HS = 8
DIMS = {"link_capacity": 1, "traffic": 1}


def _mk(d, dims=DIMS):
    ir = parser.parse_model_description(d, dims)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    return ir, model, params


def _batch(ir, sample=TINY_SAMPLE):
    spec = SampleSpec.from_ir(ir)
    s = convert_sample(sample, spec)
    return build_batch([s], ir)


def _base(agg, update_nn="state_update", num_iterations=1):
    """RouteNet skeleton with stage2 (path->link) aggregation replaced."""
    d = routenet_description(num_iterations=num_iterations, hs=HS)
    d["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = agg
    return d


def _states_after_stage1(params, num_iter=1):
    """Oracle for stage1 (ordered link->path GRU) on TINY_SAMPLE."""
    p = oracle.to_np(params)
    link = np.zeros((3, HS), np.float32)
    link[:, 0] = [10.0, 20.0, 30.0]
    path = np.zeros((2, HS), np.float32)
    path[:, 0] = [1.0, 2.0]
    paths = {0: [0, 1], 1: [1, 2]}
    for pi, links in paths.items():
        h = path[pi : pi + 1]
        for li in links:
            h = oracle.gru(p["update"]["path_update"], link[li : li + 1], h)
        path[pi] = h[0]
    return link, path


# ----------------------------------------------------------------------
# aggregations
# ----------------------------------------------------------------------


def test_attention_aggregation_oracle():
    d = _base({"type": "attention"})
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    preds, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link, path = _states_after_stage1(params)
    # stage2: attention path->link (edges: dst link ordered)
    src_e = np.array([0, 0, 1, 1])  # paths
    dst_e = np.array([0, 1, 1, 2])  # links
    ap = p["aggregation"]["s1/m0"]
    msgs = path[src_e]
    t_src = msgs @ ap["kernel1"]
    t_dst = link[dst_e] @ ap["kernel2"]
    scores = oracle.leaky_relu(
        np.concatenate([t_src, t_dst], 1) @ ap["attn_kernel"]
    ).ravel()
    w = oracle.segment_softmax_dense(scores, dst_e, 3)
    agg = np.zeros((3, HS), np.float32)
    for e in range(4):
        agg[dst_e[e]] += w[e] * msgs[e]
    new_link = oracle.gru(p["update"]["link_update"], agg, link)
    np.testing.assert_allclose(states["link"][:3], new_link, rtol=1e-4, atol=1e-5)


def test_convolution_aggregation_oracle():
    d = _base({"type": "convolution", "activation_function": "tanh"})
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link, path = _states_after_stage1(params)
    src_e = np.array([0, 0, 1, 1])
    dst_e = np.array([0, 1, 1, 2])
    msgs = path[src_e] @ p["aggregation"]["s1/m0"]["kernel"]
    nsum = np.zeros((3, HS), np.float32)
    deg = np.zeros(3)
    for e in range(4):
        nsum[dst_e[e]] += msgs[e]
        deg[dst_e[e]] += 1
    total = (nsum + link) / np.maximum(deg, 1)[:, None]
    agg = np.tanh(total)
    new_link = oracle.gru(p["update"]["link_update"], agg, link)
    np.testing.assert_allclose(states["link"][:3], new_link, rtol=1e-4, atol=1e-5)


def test_sum_multi_source_equals_manual():
    """Two sources into path with sum aggregation == segment sum of both."""
    d = qsize_description(num_iterations=1, hs=HS)
    d["message_passing"]["stages"][0]["stage_mp"][0]["aggregation"] = {"type": "sum"}
    dims = dict(DIMS, queue_sizes=1)
    ir, model, params = _mk(d, dims)
    sample = {
        "entities": {"l0": "link", "l1": "link", "n0": "node", "p0": "path"},
        "link_capacity": [5.0, 6.0],
        "queue_sizes": [3.0],
        "traffic": [1.5],
        "delay": [0.4],
        "adj_links_paths": {"p0": ["l0", "l1"]},
        "adj_nodes_paths": {"p0": ["n0"]},
        "adj_paths_links": {"l0": ["p0"], "l1": ["p0"]},
        "adj_paths_nodes": {"n0": ["p0"]},
    }
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link = np.zeros((2, HS), np.float32); link[:, 0] = [5.0, 6.0]
    node = np.zeros((1, HS), np.float32); node[:, 0] = [3.0]
    path = np.zeros((1, HS), np.float32); path[:, 0] = [1.5]
    agg = link[0] + link[1] + node[0]
    new_path = oracle.gru(p["update"]["path_update"], agg[None], path)
    np.testing.assert_allclose(states["path"][:1], new_path, rtol=1e-4, atol=1e-5)


def test_concat_axis1_two_sources():
    """concat axis=1: source blocks stacked on the time axis, GRU runs over
    final_len = sum of lens (reference generate_model.py:496-505)."""
    d = qsize_description(num_iterations=1, hs=HS)
    d["message_passing"]["stages"][0]["stage_mp"][0]["aggregation"] = {
        "type": "concat",
        "concat_axis": 1,
    }
    dims = dict(DIMS, queue_sizes=1)
    ir, model, params = _mk(d, dims)
    sample = {
        "entities": {"l0": "link", "l1": "link", "n0": "node", "p0": "path"},
        "link_capacity": [5.0, 6.0],
        "queue_sizes": [3.0],
        "traffic": [1.5],
        "delay": [0.4],
        "adj_links_paths": {"p0": ["l0", "l1"]},
        "adj_nodes_paths": {"p0": ["n0"]},
        "adj_paths_links": {"l0": ["p0"], "l1": ["p0"]},
        "adj_paths_nodes": {"n0": ["p0"]},
    }
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link = np.zeros((2, HS), np.float32); link[:, 0] = [5.0, 6.0]
    node = np.zeros((1, HS), np.float32); node[:, 0] = [3.0]
    path = np.zeros((1, HS), np.float32); path[:, 0] = [1.5]
    # block layout: [link block padded to maxlen_lp][node block]; final_len=3
    ml_lp = meta.maxlen("adj_links_paths")
    seq = np.zeros((ml_lp + meta.maxlen("adj_nodes_paths"), HS), np.float32)
    seq[0], seq[1] = link[0], link[1]
    seq[ml_lp] = node[0]
    h = path[0:1]
    for t in range(3):  # reference mask covers first final_len positions
        h = oracle.gru(p["update"]["path_update"], seq[t : t + 1], h)
    np.testing.assert_allclose(states["path"][0], h[0], rtol=1e-4, atol=1e-5)


def test_concat_axis2_two_sources():
    """concat axis=2: per-slot feature concat; update sees wider messages."""
    d = qsize_description(num_iterations=1, hs=HS)
    d["message_passing"]["stages"][0]["stage_mp"][0]["aggregation"] = {
        "type": "concat",
        "concat_axis": 2,
    }
    dims = dict(DIMS, queue_sizes=1)
    ir, model, params = _mk(d, dims)
    sample = {
        "entities": {"l0": "link", "l1": "link", "n0": "node", "n1": "node", "p0": "path"},
        "link_capacity": [5.0, 6.0],
        "queue_sizes": [3.0, 4.0],
        "traffic": [1.5],
        "delay": [0.4],
        "adj_links_paths": {"p0": ["l0", "l1"]},
        "adj_nodes_paths": {"p0": ["n0", "n1"]},
        "adj_paths_links": {"l0": ["p0"], "l1": ["p0"]},
        "adj_paths_nodes": {"n0": ["p0"], "n1": ["p0"]},
    }
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link = np.zeros((2, HS), np.float32); link[:, 0] = [5.0, 6.0]
    node = np.zeros((2, HS), np.float32); node[:, 0] = [3.0, 4.0]
    path = np.zeros((1, HS), np.float32); path[:, 0] = [1.5]
    h = path[0:1]
    for t in range(2):  # final_len = lens of first source = 2
        x = np.concatenate([link[t], node[t]])[None]
        h = oracle.gru(p["update"]["path_update"], x, h)
    np.testing.assert_allclose(states["path"][0], h[0], rtol=1e-4, atol=1e-5)


def test_interleave_oracle():
    """Interleave: pattern ['link','node'] weaves the two source sequences."""
    d = qsize_description(num_iterations=1, hs=HS)
    dims = dict(DIMS, queue_sizes=1)
    ir, model, params = _mk(d, dims)
    sample = {
        "entities": {"l0": "link", "l1": "link", "n0": "node", "n1": "node", "p0": "path"},
        "link_capacity": [5.0, 6.0],
        "queue_sizes": [3.0, 4.0],
        "traffic": [1.5],
        "delay": [0.4],
        "adj_links_paths": {"p0": ["l0", "l1"]},
        "adj_nodes_paths": {"p0": ["n0", "n1"]},
        "adj_paths_links": {"l0": ["p0"], "l1": ["p0"]},
        "adj_paths_nodes": {"n0": ["p0"], "n1": ["p0"]},
        "path_interleave": ["link", "node"],
    }
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link = np.zeros((2, HS), np.float32); link[:, 0] = [5.0, 6.0]
    node = np.zeros((2, HS), np.float32); node[:, 0] = [3.0, 4.0]
    path = np.zeros((1, HS), np.float32); path[:, 0] = [1.5]
    # interleaved order: l0, n0, l1, n1 ; final_len = 4
    h = path[0:1]
    for x in [link[0], node[0], link[1], node[1]]:
        h = oracle.gru(p["update"]["path_update"], x[None], h)
    np.testing.assert_allclose(states["path"][0], h[0], rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# message op-chains, edge params, ff update
# ----------------------------------------------------------------------


MSG_NN = {
    "nn_name": "msg_nn",
    "nn_type": "feed_forward",
    "nn_architecture": [dense(HS, "relu")],
}
UPD_NN = {
    "nn_name": "upd_nn",
    "nn_type": "feed_forward",
    "nn_architecture": [dense(HS, "tanh")],
}


def _sample_with_params():
    s = copy.deepcopy(TINY_SAMPLE)
    # adjacency with per-edge params: p: [[link, [w]], ...]
    s["adj_links_paths"] = {
        "p0": [["l0", [0.5]], ["l1", [0.7]]],
        "p1": [["l1", [0.2]], ["l2", [0.9]]],
    }
    return s


def test_message_nn_with_edge_params_and_chain():
    d = routenet_description(num_iterations=1, hs=HS)
    d["neural_networks"] += [copy.deepcopy(MSG_NN), copy.deepcopy(MSG_NN) | {"nn_name": "msg_nn2"}]
    d["message_passing"]["stages"][0]["stage_mp"][0]["source_entities"][0]["message"] = [
        {
            "type": "neural_network",
            "nn_name": "msg_nn",
            "input": ["hs_source", "hs_dest", "edge_params"],
            "output_name": "m1",
        },
        {"type": "neural_network", "nn_name": "msg_nn2", "input": ["m1", "hs_source"]},
    ]
    dims = dict(DIMS, adj_links_paths=1)
    ir, model, params = _mk(d, dims)
    sample = _sample_with_params()
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link = np.zeros((3, HS), np.float32); link[:, 0] = [10.0, 20.0, 30.0]
    path = np.zeros((2, HS), np.float32); path[:, 0] = [1.0, 2.0]
    src_e, dst_e = [0, 1, 1, 2], [0, 0, 1, 1]
    w = np.array([[0.5], [0.7], [0.2], [0.9]], np.float32)
    x1 = np.concatenate([link[src_e], path[dst_e], w], 1)
    m1 = oracle.mlp(p["message"]["s0/m0/src0/op0"], x1, ["relu"])
    x2 = np.concatenate([m1, link[src_e]], 1)
    m2 = oracle.mlp(p["message"]["s0/m0/src0/op1"], x2, ["relu"])
    # ordered aggregation + GRU over each path's messages
    new_path = path.copy()
    for pi, edges in [(0, [0, 1]), (1, [2, 3])]:
        h = path[pi : pi + 1]
        for e in edges:
            h = oracle.gru(p["update"]["path_update"], m2[e : e + 1], h)
        new_path[pi] = h[0]
    np.testing.assert_allclose(states["path"][:2], new_path, rtol=1e-4, atol=1e-5)


def test_feed_forward_update():
    d = _base({"type": "sum"})
    d["neural_networks"].append(copy.deepcopy(UPD_NN))
    d["message_passing"]["stages"][1]["stage_mp"][0]["update"] = {
        "type": "neural_network",
        "nn_name": "upd_nn",
    }
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    _, states = model.apply(params, arrays, meta, return_states=True)

    p = oracle.to_np(params)
    link, path = _states_after_stage1(params)
    agg = np.zeros((3, HS), np.float32)
    for e, (s_, d_) in enumerate(zip([0, 0, 1, 1], [0, 1, 1, 2])):
        agg[d_] += path[s_]
    x = np.concatenate([agg, link], 1)
    new_link = oracle.mlp(p["update"]["link_ff_update"], x, ["tanh"])
    np.testing.assert_allclose(states["link"][:3], new_link, rtol=1e-4, atol=1e-5)


def test_ff_update_with_sequence_agg_rejected():
    d = routenet_description(num_iterations=1, hs=HS)
    d["neural_networks"].append(copy.deepcopy(UPD_NN))
    d["message_passing"]["stages"][0]["stage_mp"][0]["update"] = {
        "type": "neural_network",
        "nn_name": "upd_nn",
    }
    ir = parser.parse_model_description(d, DIMS)
    with pytest.raises(Exception, match="feed-forward update"):
        build(ir)


def test_lstm_update_runs():
    d = routenet_description(num_iterations=2, hs=HS)
    d["neural_networks"][1] = {
        "nn_name": "state_update",
        "nn_type": "recurrent_neural_network",
        "recurrent_type": "LSTM",
    }
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    preds = model.apply(params, arrays, meta)
    assert np.isfinite(np.asarray(preds)).all()


# ----------------------------------------------------------------------
# readout pipeline
# ----------------------------------------------------------------------


def test_readout_nn_pooling_product_pipeline():
    """path -> nn -> per-graph pooling -> product with per-path states ->
    predict, exercising domain broadcasting."""
    d = routenet_description(num_iterations=1, hs=HS)
    d["neural_networks"].append(
        {
            "nn_name": "ro_nn",
            "nn_type": "feed_forward",
            "nn_architecture": [dense(HS, "relu")],
        }
    )
    d["readout"] = [
        {"type": "neural_network", "input": ["path"], "nn_name": "ro_nn", "output_name": "path_emb"},
        {"type": "pooling", "type_pooling": "mean", "input": ["path_emb"], "output_name": "graph_emb"},
        {"type": "product", "type_product": "element_wise", "input": ["path_emb", "graph_emb"], "output_name": "mixed"},
        {"type": "product", "type_product": "dot_product", "input": ["mixed", "path_emb"], "output_name": "dots"},
        {"type": "predict", "input": ["path"], "label": "delay", "label_normalization": "log", "nn_name": "readout_model"},
    ]
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    preds = model.apply(params, arrays, meta)
    assert np.isfinite(np.asarray(preds)).all()

    p = oracle.to_np(params)
    link, path = _states_after_stage1(params)
    # stage2 also runs (sum + GRU) but path states are what readout uses
    emb = oracle.mlp(p["readout"]["op0"], path, ["relu"])
    graph = emb.mean(0, keepdims=True)
    mixed = emb * graph
    dots = (mixed * emb).sum(-1, keepdims=True)
    want = oracle.mlp(p["readout"]["op4"], path, ["selu", None]).ravel()
    np.testing.assert_allclose(np.asarray(preds)[:2], want[:2], rtol=1e-4, atol=1e-5)


def test_extend_adjacencies():
    d = routenet_description(num_iterations=1, hs=HS)
    d["readout"] = [
        {
            "type": "extend_adjacencies",
            "input": ["link", "path"],
            "adj_list": "adj_links_paths",
            "output_name_src": "ext_src",
            "output_name_dst": "ext_dst",
        },
        {"type": "product", "type_product": "dot_product", "input": ["ext_src", "ext_dst"], "output_name": "edge_scores"},
        {"type": "predict", "input": ["path"], "label": "delay", "label_normalization": "log", "nn_name": "readout_model"},
    ]
    ir, model, params = _mk(d)
    arrays, meta = _batch(ir)
    preds = model.apply(params, arrays, meta)
    assert np.isfinite(np.asarray(preds)).all()


def test_pooling_multi_graph_segments():
    """Pooling on a 2-graph merged batch pools per graph, not globally."""
    d = routenet_description(num_iterations=1, hs=HS)
    d["neural_networks"].append(
        {"nn_name": "ro_nn", "nn_type": "feed_forward", "nn_architecture": [dense(HS, "relu")]}
    )
    d["readout"] = [
        {"type": "pooling", "type_pooling": "sum", "input": ["path"], "output_name": "graph_emb"},
        {"type": "product", "type_product": "element_wise", "input": ["path", "graph_emb"], "output_name": "mixed"},
        {"type": "predict", "input": ["path"], "label": "delay", "label_normalization": "log", "nn_name": "readout_model"},
    ]
    ir, model, params = _mk(d)
    spec = SampleSpec.from_ir(ir)
    s = convert_sample(TINY_SAMPLE, spec)
    a1, m1 = build_batch([s], ir)
    a2, m2 = build_batch([s, s], ir)
    p1 = model.apply(params, a1, m1)
    p2 = model.apply(params, a2, m2)
    np.testing.assert_allclose(p2[:2], p1[:2], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(p2[2:4], p1[:2], rtol=1e-4, atol=1e-6)


def test_attention_reference_quirk_mode():
    d = _base({"type": "attention"})
    ir = parser.parse_model_description(d, DIMS)
    # flip the flag on the parsed IR
    from ignnition_tpu.frontend.ir import replace

    mp = ir.stages[1].passes[0]
    new_mp = replace(mp, aggregation=replace(mp.aggregation, attention_softmax="reference"))
    new_stage = replace(ir.stages[1], passes=(new_mp,))
    ir2 = replace(ir, stages=(ir.stages[0], new_stage))
    model = build(ir2)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir2)
    arrays, meta = build_batch([convert_sample(TINY_SAMPLE, spec)], ir2)
    preds = model.apply(params, arrays, meta)
    assert np.isfinite(np.asarray(preds)).all()
