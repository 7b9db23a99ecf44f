"""DSL combination fuzz: random model descriptions across the surface
(aggregations x updates x message chains x readout pipelines), checked
against the two strongest oracle-free invariants:

  1. merged-batch == per-graph predictions (disjoint-union equivalence);
  2. fast paths == companion-stripped fallback (the host-precomputed index
     companions, dense incidence, slice maps etc. are pure accelerations —
     stripping them re-traces the same model through the generic
     gather/scatter lowering, which must agree bit-for-... well, to fp
     tolerance).

Each seed draws a different model shape; regressions in any combination of
the DSL surface show up as a seed failure naming its description.
"""

import json

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _release_fuzz_executables():
    """Every fuzz case compiles a fresh random model, so cached executables
    are dead weight; on small CI hosts the accumulated XLA CPU state has
    been observed to abort the compiler late in the file (fatal 'Aborted'
    inside backend_compile_and_load). Dropping caches between cases keeps
    the process footprint flat."""
    yield
    jax.clear_caches()

from ignnition_tpu.data import SampleSpec, build_batch
from ignnition_tpu.data.dataset import convert_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build

# the aux keys bench.py strips to get the XLA gather/scatter lowering
AUX_PREFIXES = (
    "row_ptr_", "lens_", "src_perm_", "src_row_ptr_", "src_sorted_",
    "dst_in_src_order_", "emask_src_order_", "slice_src_", "slice_sort_",
    "dense_inc_", "inc_blocks_", "bwd_slice_dst_", "out_lens_",
    "params_slice_",
)

HS = 8  # one shared state dim (convolution requires src_dim == dst_dim)


def random_description(rng: np.random.Generator):
    """One random-but-valid model description + the entity list."""
    n_entities = int(rng.integers(1, 4))
    entities = [f"ent{k}" for k in range(n_entities)]
    desc_entities = [
        {
            "name": e,
            "hidden_state_dimension": HS,
            "features": [{"name": f"f_{e}"}],
        }
        for e in entities
    ]

    nns = {}

    def ff(name, units, last=None):
        layers = [{"type_layer": "Dense", "units": units, "activation": "selu"}]
        if last is not None:
            layers.append({"type_layer": "Dense", "units": last})
        nns[name] = {
            "nn_name": name,
            "nn_type": "feed_forward",
            "nn_architecture": layers,
        }
        return name

    def gru(name):
        nns[name] = {
            "nn_name": name,
            "nn_type": "recurrent_neural_network",
            "recurrent_type": str(rng.choice(["GRU", "LSTM"])),
        }
        return name

    # ---- message passing stages ----
    adjacencies = []  # (adj_name, src, dst, has_params)
    stages = []
    n_stages = int(rng.integers(1, 3))
    used_pairs = set()
    # the update model is shared per destination entity (reference
    # generate_model.py:313) — reuse one spec per dst, and keep message
    # widths to a dst uniform (no axis-2 concat once a dst is shared)
    dst_updates: dict = {}
    patterns = []  # (dataset key, [src entity, ...]) interleave definitions
    for si in range(n_stages):
        mps = []
        for mi in range(int(rng.integers(1, 3))):
            dst = str(rng.choice(entities))
            shared = dst_updates.get(dst)
            if shared is not None and shared.get("locked"):
                continue  # dst consumed by an axis-2 concat (wider input)
            if shared is None or shared["kind"] == "recurrent":
                agg_choices = ["sum", "ordered", "attention", "convolution", "concat"]
                if len(entities) >= 2:
                    agg_choices.append("interleave")
            else:  # ff update can't consume sequence-shaped aggregations
                agg_choices = ["sum", "attention", "convolution"]
            agg = str(rng.choice(agg_choices))
            n_src = 2 if agg in ("sum", "concat", "interleave") else 1
            if agg in ("sum", "concat") and rng.random() < 0.5:
                n_src = 1
            if agg == "interleave":
                # interleave weaves DISTINCT source entities by pattern
                src_pool = list(rng.choice(entities, size=2, replace=False))
            else:
                src_pool = [str(rng.choice(entities)) for _ in range(n_src)]
            sources = []
            for src in src_pool:
                src = str(src)
                if (src, dst, si, mi) in used_pairs:
                    continue
                used_pairs.add((src, dst, si, mi))
                adj_name = f"adj_{src}_{dst}_{si}_{mi}_{len(adjacencies)}"
                has_params = bool(rng.random() < 0.25)
                adjacencies.append((adj_name, src, dst, has_params))
                msg_kind = rng.random()
                if msg_kind < 0.4:
                    message = [{"type": "direct_assignation"}]
                elif msg_kind < 0.7:
                    message = [
                        {
                            "type": "neural_network",
                            "nn_name": ff(f"msg_{adj_name}", HS),
                            "input": ["hs_source"],
                        }
                    ]
                else:
                    inputs = ["hs_source", "hs_dest"]
                    if has_params:
                        inputs.append("edge_params")
                    message = [
                        {
                            "type": "neural_network",
                            "nn_name": ff(f"msg_{adj_name}", HS),
                            "input": inputs,
                        }
                    ]
                sources.append(
                    {"name": src, "adj_vector": adj_name, "message": message}
                )
            if not sources:
                continue
            if agg == "interleave" and len(sources) < 2:
                continue  # pair collided with used_pairs — skip this draw
            aggregation = {"type": agg}
            if agg == "interleave":
                key = f"ilv_{dst}_{si}_{mi}"
                aggregation["interleave_definition"] = key
                patterns.append((key, [s["name"] for s in sources]))
            if agg == "concat":
                # axis-2 concat widens the update input (n_src * HS) — only
                # safe when this dst's update isn't shared with other widths
                axis2_ok = shared is None
                aggregation["concat_axis"] = (
                    int(rng.choice([1, 2])) if axis2_ok else 1
                )
            if agg == "attention" and rng.random() < 0.5:
                aggregation["attention_softmax"] = "reference"
            if shared is not None:
                update = shared["update"]
            else:
                # sequence-shaped aggregations need a recurrent update
                if agg in ("ordered", "concat", "interleave") or rng.random() < 0.5:
                    update = {
                        "type": "recurrent_neural_network",
                        "nn_name": gru(f"upd_{dst}"),
                    }
                    kind = "recurrent"
                else:
                    update = {
                        "type": "neural_network",
                        "nn_name": ff(f"upd_{dst}", HS),
                    }
                    kind = "mlp"
                dst_updates[dst] = {
                    "update": update,
                    "kind": kind,
                    "locked": agg == "concat"
                    and aggregation.get("concat_axis") == 2,
                }
            mps.append(
                {
                    "destination_entity": dst,
                    "source_entities": sources,
                    "aggregation": aggregation,
                    "update": update,
                }
            )
        if mps:
            stages.append({"stage_name": f"s{si}", "stage_mp": mps})
    if not stages:  # degenerate draw — force one minimal pass
        adj_name = f"adj_{entities[0]}_{entities[0]}_x"
        adjacencies.append((adj_name, entities[0], entities[0], False))
        stages = [
            {
                "stage_name": "s0",
                "stage_mp": [
                    {
                        "destination_entity": entities[0],
                        "source_entities": [
                            {
                                "name": entities[0],
                                "adj_vector": adj_name,
                                "message": [{"type": "direct_assignation"}],
                            }
                        ],
                        "aggregation": {"type": "sum"},
                        "update": {
                            "type": "recurrent_neural_network",
                            "nn_name": gru("upd_x"),
                        },
                    }
                ],
            }
        ]

    # ---- readout ----
    target = str(rng.choice(entities))
    readout = []
    pick = rng.random()
    if pick < 0.3:
        readout = [
            {
                "type": "neural_network",
                "input": [target],
                "nn_name": ff("ro_nn", HS),
                "output_name": "emb",
            },
            {
                "type": "predict",
                "input": ["emb"],
                "label": "y",
                "nn_name": ff("ro_predict", HS, last=1),
            },
        ]
    elif pick < 0.55:
        readout = [
            {
                "type": "pooling",
                "type_pooling": str(rng.choice(["sum", "mean", "max"])),
                "input": [target],
                "output_name": "pooled",
            },
            {
                "type": "predict",
                "input": ["pooled"],
                "label": "y",
                "nn_name": ff("ro_predict", HS, last=1),
            },
        ]
    elif pick < 0.8 and adjacencies:
        adj_name, src, dst, _ = adjacencies[int(rng.integers(len(adjacencies)))]
        readout = [
            {
                "type": "extend_adjacencies",
                "input": [src, dst],
                "adj_list": adj_name,
                "output_name_src": "esrc",
                "output_name_dst": "edst",
            },
            {
                "type": "product",
                "type_product": str(rng.choice(["dot_product", "element_wise"])),
                "input": ["esrc", "edst"],
                "output_name": "pair",
            },
            {
                "type": "predict",
                "input": ["pair"],
                "label": "y",
                "nn_name": ff("ro_predict", HS, last=1),
            },
        ]
    else:
        readout = [
            {
                "type": "product",
                "type_product": "element_wise",
                "input": [target, target],
                "output_name": "sq",
            },
            {
                "type": "predict",
                "input": ["sq"],
                "label": "y",
                "nn_name": ff("ro_predict", HS, last=1),
            },
        ]

    desc = {
        "entities": desc_entities,
        "message_passing": {"num_iterations": int(rng.integers(1, 3)), "stages": stages},
        "readout": readout,
        "neural_networks": list(nns.values()),
        "learning_options": {
            "loss": "MeanSquaredError",
            "optimizer": {"type": "Adam", "learning_rate": 0.001},
        },
    }
    return desc, entities, adjacencies, patterns


def random_raw_sample(rng, entities, adjacencies, patterns=()):
    """One raw JSON-style sample matching the drawn model (shuffled
    adjacency insertion order, per-dst source lists)."""
    counts = {e: int(rng.integers(3, 9)) for e in entities}
    names = {e: [f"{e}_n{i}" for i in range(counts[e])] for e in entities}
    raw = {
        "entities": {n: e for e in entities for n in names[e]},
    }
    for e in entities:
        raw[f"f_{e}"] = rng.uniform(-1, 1, counts[e]).round(3).tolist()
    for adj_name, src, dst, has_params in adjacencies:
        adj = {}
        for d in rng.permutation(counts[dst]):
            k = int(rng.integers(1, 4))
            srcs = rng.integers(0, counts[src], size=k)
            if has_params:
                adj[names[dst][int(d)]] = [
                    [names[src][int(s)], [float(rng.uniform(-1, 1))]]
                    for s in srcs
                ]
            else:
                adj[names[dst][int(d)]] = [names[src][int(s)] for s in srcs]
        raw[adj_name] = adj
    for key, pattern in patterns:
        raw[key] = list(pattern)
    return raw


@pytest.mark.parametrize("seed", range(24))
def test_fuzzed_model_invariants(seed):
    rng = np.random.default_rng(1000 + seed)
    desc, entities, adjacencies, patterns = random_description(rng)
    dims = {f"f_{e}": 1 for e in entities}
    for adj_name, _, _, has_params in adjacencies:
        if has_params:  # reference find_dataset_dimensions infers these
            dims[adj_name] = 1
    try:
        model_ir = parser.parse_model_description(desc, dims)
    except Exception as e:  # a draw the validator legitimately rejects
        pytest.fail(
            f"seed {seed}: parser rejected a generated description: {e}\n"
            + json.dumps(desc)[:2000]
        )
    spec = SampleSpec.from_ir(model_ir, training=False)
    samples = [
        convert_sample(
            random_raw_sample(rng, entities, adjacencies, patterns), spec
        )
        for _ in range(3)
    ]
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))

    merged, meta = build_batch(samples, model_ir, training=False)
    got = np.asarray(model.apply(params, merged, meta))
    assert np.isfinite(got).all(), f"seed {seed}: non-finite predictions"

    # invariant 1: merged == per-graph
    label_dom = __import__(
        "ignnition_tpu.data.graph", fromlist=["infer_label_domain"]
    ).infer_label_domain(model_ir)
    parts = []
    for s in samples:
        a1, m1 = build_batch([s], model_ir, training=False)
        p1 = np.asarray(model.apply(params, a1, m1))
        if label_dom[0] == "entity":
            parts.append(p1[np.asarray(a1[f"node_mask_{label_dom[1]}"]) > 0])
        elif label_dom[0] == "edge":
            n = int(np.sum(np.asarray(a1[f"edge_mask_{label_dom[1]}"]) > 0))
            parts.append(p1[:n])
        else:
            parts.append(p1[:1])
    if label_dom[0] == "entity":
        merged_real = got[np.asarray(merged[f"node_mask_{label_dom[1]}"]) > 0]
    elif label_dom[0] == "edge":
        n = int(np.sum(np.asarray(merged[f"edge_mask_{label_dom[1]}"]) > 0))
        merged_real = got[:n]
    else:
        merged_real = got[: len(samples)]
    np.testing.assert_allclose(
        merged_real, np.concatenate(parts), rtol=2e-4, atol=2e-5,
        err_msg=f"seed {seed}: merged != per-graph\n" + json.dumps(desc)[:2000],
    )

    # invariant 2: fast paths == companion-stripped fallback, for the
    # forward AND the gradients (the custom VJPs behind the fused paths are
    # the riskiest code in the compiler back-end)
    stripped = {
        k: v
        for k, v in merged.items()
        if not any(k.startswith(p) for p in AUX_PREFIXES)
    }
    slow = np.asarray(model.apply(params, stripped, meta))
    np.testing.assert_allclose(
        got, slow, rtol=2e-4, atol=2e-5,
        err_msg=f"seed {seed}: fast != fallback\n" + json.dumps(desc)[:2000],
    )

    def loss(p, b):
        out = model.apply(p, b, meta)
        return jax.numpy.sum(out * out)

    g_fast = jax.grad(loss)(params, merged)
    g_slow = jax.grad(loss)(params, stripped)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_fast)[0],
        jax.tree_util.tree_flatten_with_path(g_slow)[0],
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"seed {seed}: non-finite grad at {path}"
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-5,
            err_msg=f"seed {seed}: grad mismatch at {path}\n"
            + json.dumps(desc)[:2000],
        )


def test_conflicting_shared_update_is_a_friendly_error():
    """Two message passings updating the same destination with different
    update networks: the reference silently last-wins-overwrites the shared
    update model (generate_model.py:313); here it's a validation error."""
    desc, entities, _, _ = random_description(np.random.default_rng(0))
    desc = {
        "entities": [
            {"name": "a", "hidden_state_dimension": 8, "features": [{"name": "f_a"}]}
        ],
        "message_passing": {
            "num_iterations": 1,
            "stages": [
                {
                    "stage_name": "s0",
                    "stage_mp": [
                        {
                            "destination_entity": "a",
                            "source_entities": [
                                {"name": "a", "adj_vector": "adj1",
                                 "message": [{"type": "direct_assignation"}]}
                            ],
                            "aggregation": {"type": "sum"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "g1",
                            },
                        },
                        {
                            "destination_entity": "a",
                            "source_entities": [
                                {"name": "a", "adj_vector": "adj2",
                                 "message": [{"type": "direct_assignation"}]}
                            ],
                            "aggregation": {"type": "sum"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "g2",
                            },
                        },
                    ],
                }
            ],
        },
        "readout": [
            {"type": "predict", "input": ["a"], "label": "y", "nn_name": "ro"}
        ],
        "neural_networks": [
            {"nn_name": "g1", "nn_type": "recurrent_neural_network",
             "recurrent_type": "GRU"},
            {"nn_name": "g2", "nn_type": "recurrent_neural_network",
             "recurrent_type": "LSTM"},
            {"nn_name": "ro", "nn_type": "feed_forward",
             "nn_architecture": [{"type_layer": "Dense", "units": 1}]},
        ],
        "learning_options": {
            "loss": "MeanSquaredError",
            "optimizer": {"type": "Adam", "learning_rate": 0.001},
        },
    }
    with pytest.raises(Exception, match="shared per destination"):
        parser.parse_model_description(desc, {"f_a": 1})
    # same nn_name everywhere parses fine
    desc["message_passing"]["stages"][0]["stage_mp"][1]["update"]["nn_name"] = "g1"
    parser.parse_model_description(desc, {"f_a": 1})


def _label_for(raw, dom, rng):
    if dom[0] == "entity":
        n = sum(1 for v in raw["entities"].values() if v == dom[1])
        raw["y"] = rng.uniform(0.1, 1.0, n).round(3).tolist()
    elif dom[0] == "graph":
        raw["y"] = [float(rng.uniform(0.1, 1.0))]
    else:  # edge domain: one value per edge, adjacency insertion order
        n = sum(len(v) for v in raw[dom[1]].values())
        raw["y"] = rng.uniform(0.1, 1.0, n).round(3).tolist()
    return raw


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_parallel_step_matches_serial(seed):
    """Random model shapes through the SPMD parallel train step (data x
    edge-partitioned mesh) match serially-accumulated gradients."""
    import optax

    from ignnition_tpu.data.graph import PaddingConfig, infer_label_domain
    from ignnition_tpu.parallel import (
        make_mesh, make_parallel_train_step, stack_batches,
    )
    from ignnition_tpu.training import get_loss

    rng = np.random.default_rng(2000 + seed)
    desc, entities, adjacencies, patterns = random_description(rng)
    dims = {f"f_{e}": 1 for e in entities}
    for adj_name, _, _, has_params in adjacencies:
        if has_params:
            dims[adj_name] = 1
    model_ir = parser.parse_model_description(desc, dims)
    dom = infer_label_domain(model_ir)
    spec = SampleSpec.from_ir(model_ir, training=True)

    def make_sample():
        raw = _label_for(
            random_raw_sample(rng, entities, adjacencies, patterns), dom, rng
        )
        return convert_sample(raw, spec)

    pad = PaddingConfig(mode="multiple", multiple=32, min_size=32)
    batches = [
        build_batch([make_sample(), make_sample()], model_ir, pad, training=True)
        for _ in range(2)
    ]
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    loss_fn = get_loss(model_ir.learning.loss)
    # SGD(1.0): the post-step param delta IS the gradient. Comparing after
    # an ADAM step instead amplifies fp-order gradient noise to O(lr) on
    # leaves whose true gradient is structurally ~zero (e.g. attention
    # score kernels when most in-degrees are 1 — softmax over one edge is
    # score-independent), flaking on rare seeds; the optimizer plumbing is
    # optimizer-agnostic and covered by the integration tests
    opt = optax.sgd(1.0)
    opt_state = opt.init(params)

    stacked, meta = stack_batches(batches, model_ir)
    mesh = make_mesh(data=2, model=4)
    step = make_parallel_train_step(model, opt, loss_fn, meta, mesh)
    p2, _, loss_parallel = step(params, opt_state, stacked)

    def serial_loss(p):
        total = 0.0
        for arrays, m in batches:
            preds = model.apply(p, arrays, m, training=True)
            total += loss_fn(arrays["label"], preds, arrays["label_mask"])
        return total / len(batches) + model.regularization_loss(p)

    loss_serial, grads = jax.value_and_grad(serial_loss)(params)
    np.testing.assert_allclose(
        float(loss_parallel),
        float(loss_serial) - float(model.regularization_loss(params)),
        rtol=2e-4,
        err_msg=f"seed {seed}\n" + json.dumps(desc)[:1500],
    )
    updates, _ = opt.update(grads, opt_state, params)
    p_serial = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_serial)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"seed {seed}\n" + json.dumps(desc)[:1500],
        )


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_edgeshard_step_matches_serial(seed):
    """Random model shapes through the v2 destination-sharded train step
    (parallel/edgeshard.py, m=2) match serial gradients — covers every label
    domain the generator draws (entity / graph / edge via extend) and every
    aggregation over the halo-extended source tables."""
    import optax

    from ignnition_tpu.data.graph import PaddingConfig, infer_label_domain
    from ignnition_tpu.parallel import (
        make_edgeshard_train_step, make_mesh, partition_batch,
    )
    from ignnition_tpu.training import get_loss

    rng = np.random.default_rng(3000 + seed)
    desc, entities, adjacencies, patterns = random_description(rng)
    dims = {f"f_{e}": 1 for e in entities}
    for adj_name, _, _, has_params in adjacencies:
        if has_params:
            dims[adj_name] = 1
    model_ir = parser.parse_model_description(desc, dims)
    dom = infer_label_domain(model_ir)
    spec = SampleSpec.from_ir(model_ir, training=True)

    raws = [
        _label_for(
            random_raw_sample(rng, entities, adjacencies, patterns), dom, rng
        )
        for _ in range(2)
    ]
    samples = [convert_sample(r, spec) for r in raws]
    pad = PaddingConfig(mode="multiple", multiple=32, min_size=32)
    arrays, meta = build_batch(samples, model_ir, pad, training=True)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(seed))
    loss_fn = get_loss(model_ir.learning.loss)
    # SGD(1.0): the delta IS the gradient (see the parallel fuzz test for
    # why comparing after an Adam step flakes on rare seeds)
    opt = optax.sgd(1.0)

    stacked, local_meta = partition_batch(arrays, meta, model_ir, 2)
    mesh = make_mesh(data=1, model=2)
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    p2, _, loss_sharded = step(
        params, opt.init(params), {k: v[None] for k, v in stacked.items()}
    )

    def serial_data_loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"])

    def serial_loss(p):
        return serial_data_loss(p) + model.regularization_loss(p)

    np.testing.assert_allclose(
        float(loss_sharded), float(serial_data_loss(params)), rtol=2e-4,
        err_msg=f"seed {seed}\n" + json.dumps(desc)[:1500],
    )
    grads = jax.grad(serial_loss)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_serial = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_serial)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"seed {seed}\n" + json.dumps(desc)[:1500],
        )
