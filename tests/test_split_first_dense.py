"""Split-first-Dense message creation parity.

A per-edge MLP message whose inputs are drawn from {hs_source, hs_dest,
edge_params} runs its first Dense layer as per-part matmuls at NODE rate
(builder.py split-first-Dense path). This is an exact algebraic rewrite:
concat([a, b]) @ K == a @ K[:da] + b @ K[da:]. These tests force the
original concat formulation by toggling the builder's module gate and
compare forward values and gradients.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.frontend.parser import parse_model_description
from ignnition_tpu.model import build, builder as builder_mod
from tests.helpers import dense, routenet_description

HS = 8
DIMS = {"link_capacity": 1, "traffic": 1}

MSG_NN = {
    "nn_name": "pe_msg",
    "nn_type": "feed_forward",
    "nn_architecture": [dense(HS, "relu"), dense(HS, None)],
}


def _random_samples(rng, n=3, edge_params=False):
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
            if edge_params:
                adj_lp[f"p{p}"] = [
                    [f"l{h}", [float(rng.uniform(-1, 1))]] for h in hops
                ]
            else:
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


def _mk(msg_inputs, stage2_agg={"type": "sum"}, seed=0):
    d = routenet_description(num_iterations=2, hs=HS)
    d["neural_networks"].append(copy.deepcopy(MSG_NN))
    edge_params = "edge_params" in msg_inputs
    msg = [
        {"type": "neural_network", "nn_name": "pe_msg", "input": list(msg_inputs)}
    ]
    # stage1 (ordered) gets the per-edge message; stage2 keeps direct
    d["message_passing"]["stages"][0]["stage_mp"][0]["source_entities"][0][
        "message"
    ] = copy.deepcopy(msg)
    d["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = dict(stage2_agg)
    dims = dict(DIMS)
    if edge_params:
        dims["adj_links_paths"] = 1
    model_ir = parse_model_description(d, dims)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(seed + 29)
    samples = [
        convert_sample(s, spec)
        for s in _random_samples(rng, edge_params=edge_params)
    ]
    arrays, meta = build_batch(samples, model_ir)
    return model_ir, model, params, arrays, meta


INPUT_SETS = [
    ("hs_source", "hs_dest"),
    ("hs_source", "hs_dest", "edge_params"),
    ("hs_dest",),
    ("hs_source", "hs_source"),  # repeated part -> summed kernel slices
    ("edge_params", "hs_source"),  # non-canonical order
]


@pytest.mark.parametrize("inputs", INPUT_SETS, ids=["+".join(s) for s in INPUT_SETS])
def test_split_matches_concat_forward_and_grad(inputs, monkeypatch):
    model_ir, model, params, arrays, meta = _mk(inputs)

    assert builder_mod._SPLIT_FIRST  # default on
    fast = model.apply(params, arrays, meta)
    monkeypatch.setattr(builder_mod, "_SPLIT_FIRST", False)
    slow = model.apply(params, arrays, meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-6
    )

    def loss(p, split):
        monkeypatch.setattr(builder_mod, "_SPLIT_FIRST", split)
        return jnp.sum(model.apply(p, arrays, meta) ** 2)

    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, False))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g1,
        g2,
    )


def test_split_with_attention_aggregation(monkeypatch):
    # the per-edge message feeds an attention aggregation on stage1's MP
    d = routenet_description(num_iterations=2, hs=HS)
    d["neural_networks"].append(copy.deepcopy(MSG_NN))
    mp = d["message_passing"]["stages"][0]["stage_mp"][0]
    mp["source_entities"][0]["message"] = [
        {
            "type": "neural_network",
            "nn_name": "pe_msg",
            "input": ["hs_source", "hs_dest"],
        }
    ]
    mp["aggregation"] = {"type": "attention"}
    mp["update"] = {"type": "recurrent_neural_network", "nn_name": "state_update"}
    model_ir = parse_model_description(d, DIMS)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(3))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(11)
    samples = [convert_sample(s, spec) for s in _random_samples(rng)]
    arrays, meta = build_batch(samples, model_ir)

    fast = model.apply(params, arrays, meta)
    monkeypatch.setattr(builder_mod, "_SPLIT_FIRST", False)
    slow = model.apply(params, arrays, meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-6
    )


def test_named_output_still_published(monkeypatch):
    """A splittable op with an output_name feeds a later chain op."""
    d = routenet_description(num_iterations=1, hs=HS)
    d["neural_networks"] += [
        copy.deepcopy(MSG_NN),
        copy.deepcopy(MSG_NN) | {"nn_name": "pe_msg2"},
    ]
    d["message_passing"]["stages"][0]["stage_mp"][0]["source_entities"][0][
        "message"
    ] = [
        {
            "type": "neural_network",
            "nn_name": "pe_msg",
            "input": ["hs_source", "hs_dest"],
            "output_name": "m1",
        },
        {"type": "neural_network", "nn_name": "pe_msg2", "input": ["m1", "hs_source"]},
    ]
    model_ir = parse_model_description(d, DIMS)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(5))
    spec = SampleSpec.from_ir(model_ir)
    rng = np.random.default_rng(23)
    samples = [convert_sample(s, spec) for s in _random_samples(rng)]
    arrays, meta = build_batch(samples, model_ir)

    fast = model.apply(params, arrays, meta)
    monkeypatch.setattr(builder_mod, "_SPLIT_FIRST", False)
    slow = model.apply(params, arrays, meta)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-6
    )
