"""Edge partitioning v2 (destination-sharded node state + all_to_all halo,
parallel/edgeshard.py): forward and gradients must match the single-device
reference exactly on the virtual 8-device CPU mesh, and the collective volume
must be boundary-proportional (comm accounting)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.graph import PaddingConfig
from ignnition_tpu.data.synthetic import make_routenet_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build
from ignnition_tpu.parallel import (
    comm_bytes_per_step,
    make_edgeshard_apply,
    make_edgeshard_train_step,
    make_mesh,
    partition_batch,
)
from ignnition_tpu.parallel.edgeshard import EdgeShardError
from ignnition_tpu.training import build_optimizer, get_loss

from helpers import TINY_SAMPLE, routenet_description, qsize_description

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

PAD = PaddingConfig(mode="multiple", multiple=32, min_size=32)


def _setup(description=None, n_samples=2, seed=5):
    description = description or routenet_description(num_iterations=2, hs=8)
    ir = parser.parse_model_description(
        copy.deepcopy(description),
        {"link_capacity": 1, "traffic": 1, "queue_sizes": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(seed)
    samples = [
        convert_sample(make_routenet_sample(rng, 14, 10, 4), spec)
        for _ in range(n_samples)
    ]
    arrays, meta = build_batch(samples, ir, PAD)
    return ir, model, params, arrays, meta


def _stack1(stacked):
    """Add the leading data axis (size 1)."""
    return {k: v[None] for k, v in stacked.items()}


@pytest.mark.parametrize("n_model", [2, 4])
def test_edgeshard_forward_matches_single_device(n_model):
    ir, model, params, arrays, meta = _setup()
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, n_model)
    mesh = make_mesh(data=1, model=n_model)
    apply_fn = make_edgeshard_apply(model, local_meta, mesh)
    got = np.asarray(apply_fn(params, _stack1(stacked)))[0]
    # gathered rows come back in contiguous shard blocks == global row order
    # (possibly longer: node pad rounds up to n_model * B)
    mask = np.asarray(arrays["node_mask_path"]) > 0
    np.testing.assert_allclose(
        got[: mask.size][mask], want[mask], rtol=1e-5, atol=1e-6
    )


def test_edgeshard_halo_is_boundary_proportional():
    ir, model, params, arrays, meta = _setup()
    stacked, local_meta = partition_batch(arrays, meta, ir, 4)
    acc = comm_bytes_per_step(ir, meta, stacked, 4)
    for adj, row in acc.items():
        assert row["v2_halo_bytes"] < row["v1_full_psum_bytes"], (adj, row)


def test_edgeshard_train_step_matches_serial_gradients():
    ir, model, params, arrays, meta = _setup()
    loss_fn = get_loss(ir.learning.loss)
    opt = build_optimizer(ir.learning.optimizer)
    opt_state = opt.init(params)

    def serial_loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"]) + \
            model.regularization_loss(p)

    serial_grads = jax.grad(serial_loss)(params)
    updates, _ = opt.update(serial_grads, opt.init(params), params)
    want_params = optax.apply_updates(params, updates)

    stacked, local_meta = partition_batch(arrays, meta, ir, 4)
    mesh = make_mesh(data=1, model=4)
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    got_params, _, loss = step(params, opt_state, _stack1(stacked))

    flat_w, _ = jax.tree_util.tree_flatten(want_params)
    flat_g, _ = jax.tree_util.tree_flatten(got_params)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5)
    serial_l = float(loss_fn(
        arrays["label"],
        model.apply(params, arrays, meta, training=True),
        arrays["label_mask"],
    ))
    np.testing.assert_allclose(float(loss), serial_l, rtol=1e-4)


def test_edgeshard_interleave_model_matches():
    desc = qsize_description(num_iterations=2, hs=8)
    ir = parser.parse_model_description(
        copy.deepcopy(desc), {"link_capacity": 1, "traffic": 1, "queue_sizes": 1}
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(1))
    spec = SampleSpec.from_ir(ir)
    sample = {
        "entities": {
            **{f"l{i}": "link" for i in range(4)},
            **{f"p{i}": "path" for i in range(3)},
            **{f"n{i}": "node" for i in range(2)},
        },
        "link_capacity": [1.0, 2.0, 3.0, 4.0],
        "traffic": [0.5, 1.5, 1.0],
        "queue_sizes": [3.0, 7.0],
        "delay": [0.2, 0.4, 0.3],
        "adj_links_paths": {"p0": ["l0", "l1"], "p1": ["l1", "l2"], "p2": ["l3"]},
        "adj_nodes_paths": {"p0": ["n0"], "p1": ["n1"], "p2": ["n0"]},
        "adj_paths_links": {"l0": ["p0"], "l1": ["p0", "p1"], "l2": ["p1"], "l3": ["p2"]},
        "adj_paths_nodes": {"n0": ["p0", "p2"], "n1": ["p1"]},
        "path_interleave": ["link", "node"],
    }
    arrays, meta = build_batch([convert_sample(sample, spec)], ir, PAD)
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, 2)
    mesh = make_mesh(data=1, model=2)
    apply_fn = make_edgeshard_apply(model, local_meta, mesh)
    got = np.asarray(apply_fn(params, _stack1(stacked)))[0]
    mask = np.asarray(arrays["node_mask_path"]) > 0
    np.testing.assert_allclose(
        got[: mask.size][mask], want[mask], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("agg", [
    {"type": "attention"},
    {"type": "attention", "attention_softmax": "reference"},
    {"type": "convolution"},
])
def test_edgeshard_vector_aggregations_match(agg):
    desc = routenet_description(num_iterations=2, hs=8)
    # stage2 path->link becomes the aggregation under test (dims equal)
    desc["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = agg
    ir, model, params, arrays, meta = (None,) * 5
    ir = parser.parse_model_description(
        copy.deepcopy(desc), {"link_capacity": 1, "traffic": 1}
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(2))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(9)
    samples = [convert_sample(make_routenet_sample(rng, 12, 8, 4), spec)
               for _ in range(2)]
    arrays, meta = build_batch(samples, ir, PAD)
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, 4)
    mesh = make_mesh(data=1, model=4)
    got = np.asarray(make_edgeshard_apply(model, local_meta, mesh)(
        params, _stack1(stacked)))[0]
    mask = np.asarray(arrays["node_mask_path"]) > 0
    np.testing.assert_allclose(
        got[: mask.size][mask], want[mask], rtol=1e-4, atol=1e-5
    )


def test_edgeshard_graph_pooling_matches():
    desc = routenet_description(num_iterations=2, hs=8)
    desc["readout"] = [
        {"type": "pooling", "type_pooling": "mean", "input": ["path"],
         "output_name": "g_emb"},
        {"type": "product", "type_product": "element_wise",
         "input": ["path", "g_emb"], "output_name": "scaled"},
        {"type": "predict", "input": ["scaled"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir, model, params, arrays, meta = _setup(desc)
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, 4)
    mesh = make_mesh(data=1, model=4)
    got = np.asarray(make_edgeshard_apply(model, local_meta, mesh)(
        params, _stack1(stacked)))[0]
    mask = np.asarray(arrays["node_mask_path"]) > 0
    np.testing.assert_allclose(
        got[: mask.size][mask], want[mask], rtol=1e-5, atol=1e-6
    )


def _edge_label_setup(n_samples=2, seed=13):
    """Edge-domain model (extend_adjacencies -> product -> per-edge predict)
    over random RouteNet graphs with one label per adj_links_paths edge."""
    desc = routenet_description(num_iterations=2, hs=8)
    desc["readout"] = [
        {"type": "extend_adjacencies", "adj_list": "adj_links_paths",
         "input": ["link", "path"],
         "output_name_src": "esrc", "output_name_dst": "edst"},
        {"type": "product", "type_product": "element_wise",
         "input": ["esrc", "edst"], "output_name": "pair"},
        {"type": "predict", "input": ["pair"], "label": "edge_label",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(desc, {"link_capacity": 1, "traffic": 1})
    model = build(ir)
    params = model.init(jax.random.PRNGKey(3))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(n_samples):
        raw = make_routenet_sample(rng, 14, 10, 4)
        n_edges = sum(len(v) for v in raw["adj_links_paths"].values())
        raw["edge_label"] = rng.uniform(0.1, 1.0, n_edges).round(3).tolist()
        samples.append(convert_sample(raw, spec))
    arrays, meta = build_batch(samples, ir, PAD)
    return ir, model, params, arrays, meta


@pytest.mark.parametrize("n_model", [2, 4])
def test_edgeshard_edge_domain_forward_matches(n_model):
    """Edge-domain predictions under destination sharding: local per-edge
    results scatter back through edge_origin to the merged sorted order."""
    ir, model, params, arrays, meta = _edge_label_setup()
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, n_model)
    mesh = make_mesh(data=1, model=n_model)
    got = np.asarray(make_edgeshard_apply(model, local_meta, mesh)(
        params, _stack1(stacked)))[0]
    emask = np.asarray(arrays["edge_mask_adj_links_paths"]) > 0
    n_real = int(emask.sum())  # real edges are a prefix of the sorted order
    np.testing.assert_allclose(
        got[:n_real], want[:n_real], rtol=1e-5, atol=1e-6
    )


def test_edgeshard_edge_domain_train_step_matches_serial():
    ir, model, params, arrays, meta = _edge_label_setup()
    loss_fn = get_loss(ir.learning.loss)
    opt = build_optimizer(ir.learning.optimizer)

    def serial_loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"]) + \
            model.regularization_loss(p)

    serial_grads = jax.grad(serial_loss)(params)
    updates, _ = opt.update(serial_grads, opt.init(params), params)
    want_params = optax.apply_updates(params, updates)

    stacked, local_meta = partition_batch(arrays, meta, ir, 4)
    mesh = make_mesh(data=1, model=4)
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    got_params, _, loss = step(params, opt.init(params), _stack1(stacked))
    flat_w, _ = jax.tree_util.tree_flatten(want_params)
    flat_g, _ = jax.tree_util.tree_flatten(got_params)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-5)
    serial_l = float(loss_fn(
        arrays["label"],
        model.apply(params, arrays, meta, training=True),
        arrays["label_mask"],
    ))
    np.testing.assert_allclose(float(loss), serial_l, rtol=1e-4)


def test_edgeshard_entity_shaped_additional_input():
    """An additional readout input with one row per path node follows the
    path entity's block layout (meta.extra_layout) across shards."""
    desc = routenet_description(num_iterations=2, hs=8)
    desc["readout"] = [
        {"type": "product", "type_product": "element_wise",
         "input": ["path", "path_weights"], "output_name": "weighted"},
        {"type": "predict", "input": ["weighted"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(desc, {"link_capacity": 1, "traffic": 1})
    model = build(ir)
    params = model.init(jax.random.PRNGKey(4))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(21)
    samples = []
    for _ in range(2):
        raw = make_routenet_sample(rng, 14, 10, 4)
        n_paths = sum(1 for t in raw["entities"].values() if t == "path")
        raw["path_weights"] = rng.uniform(0.5, 2.0, n_paths).round(3).tolist()
        samples.append(convert_sample(raw, spec))
    arrays, meta = build_batch(samples, ir, PAD)
    assert dict(meta.extra_layout)["path_weights"] == "path"
    want = np.asarray(model.apply(params, arrays, meta))
    stacked, local_meta = partition_batch(arrays, meta, ir, 2)
    mesh = make_mesh(data=1, model=2)
    got = np.asarray(make_edgeshard_apply(model, local_meta, mesh)(
        params, _stack1(stacked)))[0]
    mask = np.asarray(arrays["node_mask_path"]) > 0
    np.testing.assert_allclose(
        got[: mask.size][mask], want[mask], rtol=1e-5, atol=1e-6
    )


def test_edgeshard_rejects_flat_additional_input():
    """A non-entity-shaped additional input has no shardable row layout."""
    desc = routenet_description(num_iterations=1, hs=8)
    desc["readout"] = [
        {"type": "product", "type_product": "element_wise",
         "input": ["path", "mystery_vec"], "output_name": "weighted"},
        {"type": "predict", "input": ["weighted"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(desc, {"link_capacity": 1, "traffic": 1})
    spec = SampleSpec.from_ir(ir)
    # length matches neither entity's node count (3 links / 2 paths)
    sample = dict(TINY_SAMPLE, mystery_vec=[1.0, 2.0, 3.0, 4.0])
    sample["entities"] = dict(TINY_SAMPLE["entities"])
    arrays, meta = build_batch([convert_sample(sample, spec)], ir, PAD)
    if dict(meta.extra_layout)["mystery_vec"]:
        pytest.skip("sample shape coincides with an entity")
    with pytest.raises(EdgeShardError, match="additional readout input"):
        partition_batch(arrays, meta, ir, 2)


def test_edgeshard_quirk_attention_train_step_matches_serial():
    """Reference-quirk attention ('reference' softmax) must TRAIN under v2:
    its per-graph max statistic crosses shards through pmax, which has no
    differentiation rule — the softmax's shift-invariance makes a
    stop_gradient'ed max exact (review-found crash)."""
    desc = routenet_description(num_iterations=2, hs=8)
    desc["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = {
        "type": "attention", "attention_softmax": "reference",
    }
    ir, model, params, arrays, meta = _setup(desc)
    loss_fn = get_loss(ir.learning.loss)
    opt = build_optimizer(ir.learning.optimizer)

    def serial_loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"]) + \
            model.regularization_loss(p)

    grads = jax.grad(serial_loss)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    want = optax.apply_updates(params, updates)

    stacked, local_meta = partition_batch(arrays, meta, ir, 2)
    mesh = make_mesh(data=1, model=2)
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    got, _, _ = step(params, opt.init(params), _stack1(stacked))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_edgeshard_sum_reduction_loss_matches_serial():
    """keras KLDivergence is a SUM over real elements; the sharded combiner
    must psum the shard sums, not mask-weight them into a mean
    (review-found: the mean combiner halved the loss)."""
    desc = routenet_description(num_iterations=2, hs=8)
    desc["learning_options"]["loss"] = "KLDivergence"
    del desc["readout"][0]["label_normalization"]
    ir, model, params, arrays, meta = _setup(desc)
    loss_fn = get_loss(ir.learning.loss)
    opt = build_optimizer(ir.learning.optimizer)

    def serial_loss(p):
        preds = model.apply(p, arrays, meta, training=True)
        return loss_fn(arrays["label"], preds, arrays["label_mask"]) + \
            model.regularization_loss(p)

    serial_l = float(loss_fn(
        arrays["label"],
        model.apply(params, arrays, meta, training=True),
        arrays["label_mask"],
    ))
    grads = jax.grad(serial_loss)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    want = optax.apply_updates(params, updates)

    stacked, local_meta = partition_batch(arrays, meta, ir, 2)
    mesh = make_mesh(data=1, model=2)
    step = make_edgeshard_train_step(model, opt, loss_fn, local_meta, mesh)
    got, _, loss = step(params, opt.init(params), _stack1(stacked))
    np.testing.assert_allclose(float(loss), serial_l, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_graph_pool_max_cross_shard_tie_splits_gradient():
    """Cross-shard max ties must split the cotangent like the serial
    segment_max VJP (review-found: each tying shard got the full cotangent,
    doubling the gradient)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ignnition_tpu.ops import segment as seg

    x = np.array([[1.0], [3.0], [3.0], [2.0]], np.float32)
    gid = np.zeros(4, np.int32)
    mask = np.ones(4, np.float32)

    def serial(xv):
        return seg.graph_pool(xv, jnp.asarray(gid), 1, jnp.asarray(mask),
                              "max").sum()

    want = np.asarray(jax.grad(serial)(jnp.asarray(x)))

    mesh = make_mesh(data=1, model=2)

    def local(xv, gidv, maskv):
        # the pooled value is replicated across shards (pmax + psum residual)
        return seg.graph_pool(xv, gidv, 1, maskv, "max",
                              axis_name="model").sum()

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model")),
        out_specs=P(),
    )
    got = np.asarray(jax.grad(
        lambda xv: fn(xv, jnp.asarray(gid), jnp.asarray(mask))
    )(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               err_msg=f"serial {want.ravel()} vs sharded "
                                       f"{got.ravel()}")


def test_trainer_dest_shard_edge_domain(tmp_path):
    """Edge-domain-label models stream through the Trainer's dest_shard path
    (edge labels shard with their adjacency; pad_to keeps shapes stable)."""
    import json as _json
    import tarfile
    from io import BytesIO

    from ignnition_tpu.training.trainer import Trainer

    rng = np.random.default_rng(17)
    raws = []
    for _ in range(6):
        raw = make_routenet_sample(rng, 14, 10, 4)
        ne = sum(len(v) for v in raw["adj_links_paths"].values())
        raw["edge_label"] = rng.uniform(0.1, 1.0, ne).round(3).tolist()
        raws.append(raw)
    d = tmp_path / "ds"
    d.mkdir()
    payload = _json.dumps(raws).encode()
    with tarfile.open(d / "s.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo("data.json")
        info.size = len(payload)
        tar.addfile(info, BytesIO(payload))

    desc = routenet_description(num_iterations=2, hs=8)
    desc["readout"] = [
        {"type": "extend_adjacencies", "adj_list": "adj_links_paths",
         "input": ["link", "path"],
         "output_name_src": "esrc", "output_name_dst": "edst"},
        {"type": "product", "type_product": "element_wise",
         "input": ["esrc", "edst"], "output_name": "pair"},
        {"type": "predict", "input": ["pair"], "label": "edge_label",
         "nn_name": "readout_model"},
    ]
    ir = parser.parse_model_description(desc, {"link_capacity": 1, "traffic": 1})
    model = build(ir)
    tr = Trainer(model, padding=PAD)
    state = tr.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=4)
    state = tr.train(
        state, str(d), max_steps=3, batch_size=1, mesh=mesh,
        model_strategy="dest_shard", log_every=0,
    )
    assert state.step == 3
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_trainer_dest_shard_integration(tmp_path):
    """Trainer.train(mesh=..., model_strategy='dest_shard') streams
    partitioned batches through the v2 step (shape-stable via pad_to);
    locality_reorder='auto' rides this path by default."""
    from ignnition_tpu.data.synthetic import write_dataset
    from ignnition_tpu.training.trainer import Trainer

    d = str(tmp_path / "ds")
    write_dataset(d, 2, 6, seed=3)
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    from ignnition_tpu.model import build as build_model

    model = build_model(ir)
    tr = Trainer(model, padding=PAD)
    state = tr.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=4)
    state = tr.train(
        state, d, max_steps=3, batch_size=1, mesh=mesh,
        model_strategy="dest_shard", log_every=0,
    )
    assert state.step == 3
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_trainer_locality_reorder_is_exact(tmp_path):
    """The locality renumbering is a pure permutation: the SAME training run
    with locality_reorder on vs off lands on identical parameters."""
    from ignnition_tpu.data.synthetic import write_dataset
    from ignnition_tpu.training.trainer import Trainer

    d = str(tmp_path / "ds")
    write_dataset(d, 1, 4, seed=9, n_links=24, n_paths=20)
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    from ignnition_tpu.model import build as build_model

    model = build_model(ir)
    mesh = make_mesh(data=1, model=2)

    def run(reorder):
        tr = Trainer(model, padding=PAD)
        state = tr.init_state(jax.random.PRNGKey(1))
        return tr.train(
            state, d, max_steps=3, batch_size=2, mesh=mesh, shuffle=False,
            model_strategy="dest_shard", log_every=0,
            locality_reorder=reorder,
        )

    p_on = run(True).params
    p_off = run(False).params
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        p_on, p_off,
    )


def test_destshard_memo_ignores_transient_repadded_dicts(tmp_path, monkeypatch):
    """Regression (advisor-found, r4): the cache=True partition memo is keyed
    by id(arrays); the mixed-meta branch repads items into TRANSIENT dicts
    whose ids the allocator can recycle — a later group with a recycled id and
    a stable pad_key would silently receive a DIFFERENT batch's partition.

    Reproduced deterministically by forcing repad_to_meta to hand out dicts
    from a fixed 2-object pool (ids recycle every group). With the fix the
    mixed-meta path never consults the memo, so the second group's stacked
    arrays must reflect its own (different) feature values."""
    import json as _json
    import tarfile
    from io import BytesIO

    import ignnition_tpu.data.graph as graph_mod
    from ignnition_tpu.training.trainer import Trainer

    rng = np.random.default_rng(11)
    small = make_routenet_sample(rng, 14, 10, 4)
    large = make_routenet_sample(rng, 40, 30, 6)
    small2 = copy.deepcopy(small)
    small2["traffic"] = [t + 1.0 for t in small["traffic"]]
    large2 = copy.deepcopy(large)
    large2["traffic"] = [t + 1.0 for t in large["traffic"]]
    d = tmp_path / "ds"
    d.mkdir()
    payload = _json.dumps([small, large, small2, large2]).encode()
    with tarfile.open(d / "sample_0.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo("data.json")
        info.size = len(payload)
        tar.addfile(info, BytesIO(payload))

    real_repad = graph_mod.repad_to_meta
    pool = [{}, {}]
    calls = {"n": 0}

    def recycling_repad(arrays, meta, target, ir):
        out = real_repad(arrays, meta, target, ir)
        slot = pool[calls["n"] % 2]
        calls["n"] += 1
        slot.clear()
        slot.update(out)
        return slot

    monkeypatch.setattr(graph_mod, "repad_to_meta", recycling_repad)

    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    model = build(ir)
    tr = Trainer(model, padding=PAD)
    mesh = make_mesh(data=2, model=2)
    it = tr._destshard_batch_iter(
        str(d), batch_size=1, mesh=mesh, shuffle=False, cache=True
    )
    out1, _ = next(it)
    out1 = {k: np.array(v) for k, v in out1.items()}
    out2, _ = next(it)
    # the mixed-meta repad branch must actually have run
    assert calls["n"] >= 4
    differs = any(
        out1[k].shape != np.shape(out2[k]) or not np.allclose(out1[k], np.array(out2[k]))
        for k in out1
    )
    assert differs, (
        "second group returned the first group's partition — transient "
        "repadded dicts leaked into the id-keyed memo"
    )
