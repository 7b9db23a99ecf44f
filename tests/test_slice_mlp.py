"""Slice-rate (ordered) and slot-rate (sum) per-edge message MLP paths
(builder._SLICE_MLP / _SLOT_SUM): per-edge MLPs over {hs_source, hs_dest}
must compute EXACTLY the per-edge formulation while never materializing an
[E, D] tensor or issuing a per-edge gather (PERF.md 'Per-edge message
models', round 3)."""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build
from ignnition_tpu.model import builder as B

from helpers import routenet_description

DIMS = {"link_capacity": 1, "traffic": 1,
        "adj_links_paths": 0, "adj_paths_links": 0}


def _mlp_desc(inputs=("hs_source", "hs_dest"), iters=3, extra_op=False,
              output_name=None):
    desc = routenet_description(num_iterations=iters, hs=8)
    nn = {"nn_name": "msg", "nn_type": "feed_forward",
          "nn_architecture": [
              {"type_layer": "Dense", "units": 12, "activation": "relu"},
              {"type_layer": "Dense", "units": 8, "activation": "None"}]}
    desc["neural_networks"].append(nn)
    msg = {"type": "neural_network", "nn_name": "msg", "input": list(inputs)}
    if output_name:
        msg["output_name"] = output_name
    chain = [msg]
    if extra_op:
        chain = [dict(msg, output_name="m1"),
                 {"type": "neural_network", "nn_name": "msg", "input": ["m1"]}]
    for st in desc["message_passing"]["stages"]:
        for mp in st["stage_mp"]:
            for se in mp["source_entities"]:
                se["message"] = copy.deepcopy(chain)
    return desc


def _batch_of(desc, seed=5, n_link=9, n_path=7):
    ir = parser.parse_model_description(copy.deepcopy(desc), dict(DIMS))
    r = np.random.RandomState(seed)
    entities = {f"l{i}": "link" for i in range(n_link)}
    entities.update({f"p{i}": "path" for i in range(n_path)})
    adj = {}
    inv = {f"l{i}": [] for i in range(n_link)}
    for p in range(n_path):
        links = r.choice(n_link, size=r.randint(2, 5), replace=False)
        adj[f"p{p}"] = [f"l{i}" for i in links]
        for i in links:
            inv[f"l{i}"].append(f"p{p}")
    sample = {"entities": entities,
              "link_capacity": r.rand(n_link).tolist(),
              "traffic": r.rand(n_path).tolist(),
              "delay": r.rand(n_path).tolist(),
              "adj_links_paths": adj,
              "adj_paths_links": {k: v for k, v in inv.items() if v}}
    arrays, meta = build_batch(
        [convert_sample(sample, SampleSpec.from_ir(ir))], ir
    )
    return ir, arrays, meta


def _loss_and_grads(ir, arrays, meta, slice_mlp, slot_sum):
    old = B._SLICE_MLP, B._SLOT_SUM
    B._SLICE_MLP, B._SLOT_SUM = slice_mlp, slot_sum
    try:
        model = build(ir)
        params = model.init(jax.random.PRNGKey(0))

        def loss(p):
            preds = model.apply(p, arrays, meta, training=True)
            m = arrays["label_mask"]
            return jnp.sum(
                jnp.square(preds.reshape(-1) - arrays["label"].reshape(-1)) * m
            ) / jnp.sum(m)

        l, g = jax.value_and_grad(loss)(params)
        return float(l), jax.tree_util.tree_leaves(g)
    finally:
        B._SLICE_MLP, B._SLOT_SUM = old


@pytest.mark.parametrize("inputs", [("hs_source", "hs_dest"),
                                    ("hs_source",), ("hs_dest",),
                                    ("hs_source", "hs_source")])
def test_fast_paths_match_per_edge(inputs):
    ir, arrays, meta = _batch_of(_mlp_desc(inputs))
    base_l, base_g = _loss_and_grads(ir, arrays, meta, False, False)
    fast_l, fast_g = _loss_and_grads(ir, arrays, meta, True, True)
    np.testing.assert_allclose(fast_l, base_l, rtol=1e-6)
    for a, b in zip(fast_g, base_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_paths_actually_fire():
    """Both fast paths trace gather_state_slices; the per-edge formulation
    traces none (the message-loop version is DCE'd)."""
    from ignnition_tpu.ops import segment as seg

    ir, arrays, meta = _batch_of(_mlp_desc())
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    orig = seg.gather_state_slices
    calls = []

    def wrapped(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    seg.gather_state_slices = wrapped
    try:
        B._SLICE_MLP = B._SLOT_SUM = True
        model.apply(params, arrays, meta)
        # ordered stage1 + sum stage2, traced once per iteration when the
        # iteration loop is python-unrolled (builder._iter_unroll), once
        # total under lax.scan
        expected = 2 * (ir.num_iterations if B._iter_unroll(ir.num_iterations)
                        else 1)
        assert len(calls) == expected, (len(calls), expected)
        calls.clear()
        B._SLICE_MLP = B._SLOT_SUM = False
        model.apply(params, arrays, meta)
        assert len(calls) == 0
    finally:
        seg.gather_state_slices = orig
        B._SLICE_MLP = B._SLOT_SUM = True


def test_ineligible_chains_still_exact():
    """Published output_name and multi-op chains need the per-edge layout —
    the fast paths must skip them, and results stay exact."""
    for kw in (dict(extra_op=True), dict(output_name="mvar")):
        ir, arrays, meta = _batch_of(_mlp_desc(**kw))
        base_l, _ = _loss_and_grads(ir, arrays, meta, False, False)
        fast_l, _ = _loss_and_grads(ir, arrays, meta, True, True)
        np.testing.assert_allclose(fast_l, base_l, rtol=1e-6)


def test_bf16_compute_dtype_runs():
    ir, arrays, meta = _batch_of(_mlp_desc())
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, arrays, meta, compute_dtype=jnp.bfloat16)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def _attention_desc(message=None):
    desc = _mlp_desc() if message else routenet_description(num_iterations=3, hs=8)
    desc["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = {
        "type": "attention"
    }
    if message:
        desc["message_passing"]["stages"][1]["stage_mp"][0][
            "source_entities"][0]["message"] = [
            {"type": "neural_network", "nn_name": "msg",
             "input": list(message)}]
    return desc


@pytest.mark.parametrize("message", [None, ("hs_source", "hs_dest"),
                                     ("hs_source",)])
def test_slot_attention_matches(message):
    """Slot-rate per-destination GAT equals the per-edge/dense formulations
    for direct, per-edge-MLP, and source-local messages (fwd+grad).

    Dense incidence companions are stripped so the slot path actually fires
    for source-local messages too (in production those prefer the dense
    path — builder gates on the companions; the slot layout serves per-edge
    chains and over-the-dense-cap models)."""
    ir, arrays, meta = _batch_of(_attention_desc(message))
    arrays = {k: v for k, v in arrays.items()
              if not k.startswith(("dense_inc_", "inc_blocks_"))}
    old = B._SLOT_ATTN
    try:
        B._SLOT_ATTN = True
        on_l, on_g = _loss_and_grads(ir, arrays, meta, True, True)
        B._SLOT_ATTN = False
        off_l, off_g = _loss_and_grads(ir, arrays, meta, True, True)
    finally:
        B._SLOT_ATTN = old
    np.testing.assert_allclose(on_l, off_l, rtol=1e-6)
    for a, b in zip(on_g, off_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_slot_attention_skips_reference_quirk():
    """attention_softmax='reference' must keep the quirk-exact path."""
    desc = _attention_desc(None)
    desc["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"][
        "attention_softmax"] = "reference"
    ir, arrays, meta = _batch_of(desc)
    old = B._SLOT_ATTN
    try:
        B._SLOT_ATTN = True
        on_l, _ = _loss_and_grads(ir, arrays, meta, True, True)
        B._SLOT_ATTN = False
        off_l, _ = _loss_and_grads(ir, arrays, meta, True, True)
    finally:
        B._SLOT_ATTN = old
    np.testing.assert_allclose(on_l, off_l, rtol=1e-6)


def test_edge_params_chain_rides_slot_paths():
    """Chains reading edge_params are slot-eligible via the host-relaid
    params_slice layout (data/graph.py slot_param_adjacencies) — exact vs
    the per-edge formulation, and params_slice actually present."""
    desc = _mlp_desc(inputs=("hs_source", "hs_dest"))
    for st in desc["message_passing"]["stages"]:
        for mp in st["stage_mp"]:
            for se in mp["source_entities"]:
                se["message"][0]["input"] = [
                    "hs_source", "hs_dest", "edge_params"]
    ir = parser.parse_model_description(copy.deepcopy(desc), {
        "link_capacity": 1, "traffic": 1,
        "adj_links_paths": 2, "adj_paths_links": 2,
    })
    r = np.random.RandomState(9)
    n_link, n_path = 8, 6
    entities = {f"l{i}": "link" for i in range(n_link)}
    entities.update({f"p{i}": "path" for i in range(n_path)})
    adj, inv = {}, {}
    for p in range(n_path):
        links = r.choice(n_link, size=r.randint(2, 4), replace=False)
        adj[f"p{p}"] = [[f"l{i}", r.rand(2).tolist()] for i in links]
        for i in links:
            inv.setdefault(f"l{i}", []).append([f"p{p}", r.rand(2).tolist()])
    sample = {"entities": entities,
              "link_capacity": r.rand(n_link).tolist(),
              "traffic": r.rand(n_path).tolist(),
              "delay": r.rand(n_path).tolist(),
              "adj_links_paths": adj, "adj_paths_links": inv}
    arrays, meta = build_batch(
        [convert_sample(sample, SampleSpec.from_ir(ir))], ir
    )
    assert "params_slice_adj_links_paths" in arrays
    assert "params_slice_adj_paths_links" in arrays

    def run(slice_mlp, slot_sum):
        old = B._SLICE_MLP, B._SLOT_SUM
        B._SLICE_MLP, B._SLOT_SUM = slice_mlp, slot_sum
        try:
            model = build(ir)
            params = model.init(jax.random.PRNGKey(0))

            def loss(p):
                preds = model.apply(p, arrays, meta, training=True)
                m = arrays["label_mask"]
                return jnp.sum(jnp.square(
                    preds.reshape(-1) - arrays["label"].reshape(-1)) * m
                ) / jnp.sum(m)

            l, g = jax.value_and_grad(loss)(params)
            return float(l), jax.tree_util.tree_leaves(g)
        finally:
            B._SLICE_MLP, B._SLOT_SUM = old

    on_l, on_g = run(True, True)
    off_l, off_g = run(False, False)
    np.testing.assert_allclose(on_l, off_l, rtol=1e-6)
    for a, b in zip(on_g, off_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_params_slice_presence_consistent_across_stacked_batches():
    """params_slice presence must be a pure function of the TARGET meta
    (review regression: the slot cap was evaluated at per-batch sizes, so
    two batches repadded to one target could disagree on the key and crash
    np.stack in stack_batches)."""
    from ignnition_tpu.frontend.ir import SLOT_PAD_CAP
    from ignnition_tpu.parallel.steps import stack_batches

    desc = _mlp_desc(inputs=("hs_source", "hs_dest"), iters=1)
    # capped slot consumer: sum aggregation reading edge_params
    for st in desc["message_passing"]["stages"]:
        for mp in st["stage_mp"]:
            mp["aggregation"] = {"type": "sum"}
            mp["update"] = {"type": "recurrent_neural_network",
                            "nn_name": "state_update"}
            for se in mp["source_entities"]:
                se["message"][0]["input"] = [
                    "hs_source", "hs_dest", "edge_params"]
    ir = parser.parse_model_description(copy.deepcopy(desc), {
        "link_capacity": 1, "traffic": 1,
        "adj_links_paths": 2, "adj_paths_links": 2,
    })
    spec = SampleSpec.from_ir(ir)
    r = np.random.RandomState(3)

    def mk(degrees):
        """degrees[p] = in-degree of path p (links drawn round-robin)."""
        n_link, n_path = 40, len(degrees)
        entities = {f"l{i}": "link" for i in range(n_link)}
        entities.update({f"p{i}": "path" for i in range(n_path)})
        adj, inv = {}, {}
        for p, deg in enumerate(degrees):
            links = [(p * 7 + k) % n_link for k in range(deg)]
            adj[f"p{p}"] = [[f"l{i}", r.rand(2).tolist()] for i in links]
            for i in links:
                inv.setdefault(f"l{i}", []).append(
                    [f"p{p}", r.rand(2).tolist()])
        sample = {"entities": entities,
                  "link_capacity": r.rand(n_link).tolist(),
                  "traffic": r.rand(n_path).tolist(),
                  "delay": r.rand(n_path).tolist(),
                  "adj_links_paths": adj, "adj_paths_links": inv}
        return convert_sample(sample, spec)

    # batch A: small uniform in-degrees -> slot-eligible at its own sizes;
    # batch B: one highly-skewed destination -> over the cap at its sizes
    bA = build_batch([mk([2] * 8)], ir)
    bB = build_batch([mk([33, 1, 1, 1])], ir)
    has_A = "params_slice_adj_links_paths" in bA[0]
    has_B = "params_slice_adj_links_paths" in bB[0]
    assert has_A and not has_B  # the divergence under test

    arrays, meta = stack_batches([bA, bB], ir)  # must not raise
    slot = dict(meta.max_len)["adj_links_paths"] * dict(meta.node_pad)["path"]
    eligible = slot <= SLOT_PAD_CAP * dict(meta.edge_pad)["adj_links_paths"]
    assert ("params_slice_adj_links_paths" in arrays) == eligible
    # both stacked shards run
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    for d in range(2):
        model.apply(params, {k: v[d] for k, v in arrays.items()}, meta)


@pytest.mark.parametrize("inputs", [("hs_source", "hs_dest"),
                                    ("hs_dest",)])
def test_scan_tail_and_slot3d_variants_match(inputs):
    """r5 lowering variants of the slot-MLP tail — inside the scan body
    (_SCAN_TAIL), on the 3D tensor (_SLOT_3D), and the legacy 2D flatten —
    are the same math: identical loss and gradients."""
    ir, arrays, meta = _batch_of(_mlp_desc(inputs))

    def run(scan_tail, slot_3d):
        old = B._SCAN_TAIL, B._SLOT_3D
        B._SCAN_TAIL, B._SLOT_3D = scan_tail, slot_3d
        try:
            return _loss_and_grads(ir, arrays, meta, True, True)
        finally:
            B._SCAN_TAIL, B._SLOT_3D = old

    l_tail, g_tail = run(True, True)
    l_3d, g_3d = run(False, True)
    l_2d, g_2d = run(False, False)
    np.testing.assert_allclose(l_tail, l_2d, rtol=1e-6)
    np.testing.assert_allclose(l_3d, l_2d, rtol=1e-6)
    for a, b, c in zip(g_tail, g_3d, g_2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
