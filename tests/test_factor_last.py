"""Factored-last-Dense message aggregation: for a sum aggregation over MLP
messages ending in a linear Dense layer, sum_e(g(x_e) @ K + b) ==
(sum_e g(x_e)) @ K + deg * b — the last matmul runs at NODE rate
(builder.py message-creation loop). Must equal the unfactored formulation
exactly (forward and gradients)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.synthetic import make_routenet_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build, builder as B

from helpers import TINY_SAMPLE, routenet_description, dense


def _desc(message_inputs, last_act="None", use_bias=True, three_layer=False):
    d = routenet_description(num_iterations=2, hs=8)
    arch = [dense(12, "relu")]
    if three_layer:
        arch.append({"type_layer": "Dropout", "rate": 0.0})
        arch.append(dense(10, "tanh"))
    arch.append({"type_layer": "Dense", "units": 8, "activation": last_act,
                 "use_bias": use_bias})
    d["neural_networks"].append(
        {"nn_name": "msg_nn", "nn_type": "feed_forward", "nn_architecture": arch}
    )
    # stage2 path->link is the sum aggregation
    mp = d["message_passing"]["stages"][1]["stage_mp"][0]
    mp["source_entities"][0]["message"] = [
        {"type": "neural_network", "nn_name": "msg_nn", "input": list(message_inputs)}
    ]
    return d


def _run(d, sample, factor, params=None, grad=False):
    ir = parser.parse_model_description(copy.deepcopy(d),
                                        {"link_capacity": 1, "traffic": 1})
    model = build(ir)
    if params is None:
        params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir)
    old = B._FACTOR_LAST
    B._FACTOR_LAST = factor
    try:
        if grad:
            def loss(p):
                return jnp.sum(
                    (model.apply(p, arrays, meta) * arrays["label_mask"]) ** 2
                )
            g = jax.grad(loss)(params)
            return params, jax.tree_util.tree_leaves(g)
        return params, np.asarray(model.apply(params, arrays, meta))
    finally:
        B._FACTOR_LAST = old


SAMPLE = dict(
    TINY_SAMPLE,
)


@pytest.mark.parametrize("inputs", [
    ("hs_source", "hs_dest"),
    ("hs_dest",),
])
@pytest.mark.parametrize("three_layer", [False, True])
def test_factored_matches_unfactored(inputs, three_layer):
    d = _desc(inputs, three_layer=three_layer)
    params, want = _run(d, TINY_SAMPLE, factor=False)
    _, got = _run(d, TINY_SAMPLE, factor=True, params=params)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    _, gw = _run(d, TINY_SAMPLE, factor=False, params=params, grad=True)
    _, gg = _run(d, TINY_SAMPLE, factor=True, params=params, grad=True)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_factored_no_bias():
    d = _desc(("hs_source", "hs_dest"), use_bias=False)
    params, want = _run(d, TINY_SAMPLE, factor=False)
    _, got = _run(d, TINY_SAMPLE, factor=True, params=params)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nonlinear_last_layer_not_factored():
    """A nonlinear last layer must NOT factor (sum does not commute); both
    modes must agree because factoring never engages."""
    d = _desc(("hs_source", "hs_dest"), last_act="relu")
    params, want = _run(d, TINY_SAMPLE, factor=False)
    _, got = _run(d, TINY_SAMPLE, factor=True, params=params)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_factored_on_random_graph():
    rng = np.random.default_rng(3)
    ir0 = parser.parse_model_description(
        routenet_description(num_iterations=1, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    sample_raw = make_routenet_sample(rng, 12, 9, 4)
    d = _desc(("hs_source", "hs_dest"))
    params, want = _run(d, sample_raw, factor=False)
    _, got = _run(d, sample_raw, factor=True, params=params)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
