"""Robustness edge cases: empty entities in a sample, features filling the
entire state, single-node graphs, zero-degree destinations, hs overflow."""

import copy

import jax
import numpy as np
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build, BuildError

from helpers import TINY_SAMPLE, routenet_description, qsize_description


DIMS = {"link_capacity": 1, "traffic": 1}


def _run(d, sample, dims=DIMS):
    ir = parser.parse_model_description(d, dims)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    return np.asarray(model.apply(params, arrays, meta))


def test_zero_degree_destination():
    """A path with links plus a link no path crosses (sum over empty set)."""
    s = copy.deepcopy(TINY_SAMPLE)
    s["entities"]["l3"] = "link"
    s["link_capacity"] = [10.0, 20.0, 30.0, 40.0]
    # adj_paths_links omits l3 entirely (zero in-degree)
    preds = _run(routenet_description(num_iterations=2, hs=8), s)
    assert np.isfinite(preds).all()


def test_single_node_single_path():
    s = {
        "entities": {"l0": "link", "p0": "path"},
        "link_capacity": [5.0],
        "traffic": [1.0],
        "delay": [0.2],
        "adj_links_paths": {"p0": ["l0"]},
        "adj_paths_links": {"l0": ["p0"]},
    }
    preds = _run(routenet_description(num_iterations=3, hs=8), s)
    assert np.isfinite(preds).all()


def test_features_fill_entire_state():
    """hidden_state_dimension == total feature size: zero-width padding."""
    d = routenet_description(num_iterations=1, hs=1)
    preds = _run(d, TINY_SAMPLE)
    assert np.isfinite(preds).all()


def test_features_exceed_state_rejected():
    d = routenet_description(num_iterations=1, hs=8)
    ir = parser.parse_model_description(d, {"link_capacity": 16, "traffic": 1})
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    s = copy.deepcopy(TINY_SAMPLE)
    s["link_capacity"] = [[float(i) for i in range(16)]] * 3
    arrays, meta = build_batch([convert_sample(s, spec)], ir)
    with pytest.raises(BuildError, match="exceed"):
        model.apply(params, arrays, meta)


def test_entity_with_zero_nodes_in_sample():
    """A qsize sample where one entity type has no nodes at all."""
    d = qsize_description(num_iterations=1, hs=8)
    dims = dict(DIMS, queue_sizes=1)
    ir = parser.parse_model_description(d, dims)
    # nodes absent -> interleave pattern references empty adjacency; the
    # dataset layer must produce the friendly error, not crash
    s = {
        "entities": {"l0": "link", "p0": "path"},
        "link_capacity": [5.0],
        "traffic": [1.0],
        "queue_sizes": [],
        "delay": [0.2],
        "adj_links_paths": {"p0": ["l0"]},
        "adj_nodes_paths": {},
        "adj_paths_links": {"l0": ["p0"]},
        "adj_paths_nodes": {},
        "path_interleave": ["link", "node"],
    }
    spec = SampleSpec.from_ir(ir)
    from ignnition_tpu.data.dataset import DatasetError

    with pytest.raises(DatasetError, match="interleave"):
        convert_sample(s, spec)


def test_many_graphs_merged():
    """32 graphs in one merged batch stay per-graph exact."""
    ir = parser.parse_model_description(routenet_description(num_iterations=2, hs=8), DIMS)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    s = convert_sample(TINY_SAMPLE, spec)
    single, m1 = build_batch([s], ir)
    many, m2 = build_batch([s] * 32, ir)
    p1 = np.asarray(model.apply(params, single, m1))[:2]
    p2 = np.asarray(model.apply(params, many, m2))
    for g in range(32):
        np.testing.assert_allclose(p2[2 * g : 2 * g + 2], p1, rtol=1e-4, atol=1e-6)
