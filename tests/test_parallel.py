"""Multi-device correctness on the virtual 8-device CPU mesh: data-parallel
and edge-partitioned steps must match the single-device reference exactly."""

import jax
import numpy as np
import pytest

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.graph import PaddingConfig
from ignnition_tpu.data.synthetic import make_routenet_sample
from ignnition_tpu.frontend import parser
from ignnition_tpu.model import build
from ignnition_tpu.parallel import (
    make_mesh,
    make_parallel_apply,
    make_parallel_train_step,
    stack_batches,
)
from ignnition_tpu.training import Trainer, build_optimizer, get_loss

from helpers import routenet_description

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup():
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(5)
    pad = PaddingConfig(mode="multiple", multiple=64, min_size=64)
    batches = []
    for _ in range(4):
        samples = [
            convert_sample(make_routenet_sample(rng, 14, 10, 4), spec)
            for _ in range(2)
        ]
        batches.append(build_batch(samples, ir, pad))
    return ir, model, params, batches


def test_dp_apply_matches_single_device():
    ir, model, params, batches = _setup()
    stacked, meta = stack_batches(batches, ir)
    mesh = make_mesh(data=4, model=1)
    apply_fn = make_parallel_apply(model, meta, mesh)
    preds = np.asarray(apply_fn(params, stacked))
    for i, (arrays, m) in enumerate(batches):
        want = np.asarray(model.apply(params, arrays, m))
        np.testing.assert_allclose(preds[i], want, rtol=1e-5, atol=1e-6)


def test_edge_partitioned_apply_matches():
    ir, model, params, batches = _setup()
    stacked, meta = stack_batches(batches[:2], ir)
    mesh = make_mesh(data=2, model=4)
    apply_fn = make_parallel_apply(model, meta, mesh)
    preds = np.asarray(apply_fn(params, stacked))
    for i, (arrays, m) in enumerate(batches[:2]):
        want = np.asarray(model.apply(params, arrays, m))
        np.testing.assert_allclose(preds[i], want, rtol=1e-4, atol=1e-5)


def test_parallel_train_step_matches_serial_gradients():
    ir, model, params, batches = _setup()
    loss_fn = get_loss(ir.learning.loss)
    opt = build_optimizer(ir.learning.optimizer)
    opt_state = opt.init(params)

    stacked, meta = stack_batches(batches, ir)
    mesh = make_mesh(data=4, model=2)
    step = make_parallel_train_step(model, opt, loss_fn, meta, mesh)
    p2, _, loss_parallel = step(params, opt_state, stacked)

    # serial reference: mean loss/grads over the four batches
    import optax

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
        rtol=1e-5,
    )
    updates, _ = opt.update(grads, opt_state, params)
    p_serial = optax.apply_updates(params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p_serial)
    ):
        # atol sized for Adam's noise amplification: near-zero gradients map
        # to ~lr-scale updates through g/sqrt(v), so a few-ulp f32 gradient
        # difference (sharded psum vs serial reduction order) can move an
        # updated parameter by O(1e-6) while staying exact in substance
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_attention_model_edge_partitioned():
    d = routenet_description(num_iterations=2, hs=8)
    d["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = {
        "type": "attention"
    }
    ir = parser.parse_model_description(d, {"link_capacity": 1, "traffic": 1})
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(6)
    pad = PaddingConfig(mode="multiple", multiple=64, min_size=64)
    b1 = build_batch(
        [convert_sample(make_routenet_sample(rng, 14, 10, 4), spec)], ir, pad
    )
    stacked, meta = stack_batches([b1], ir)
    mesh = make_mesh(data=1, model=8)
    apply_fn = make_parallel_apply(model, meta, mesh)
    preds = np.asarray(apply_fn(params, stacked))
    want = np.asarray(model.apply(params, b1[0], b1[1]))
    np.testing.assert_allclose(preds[0], want, rtol=1e-4, atol=1e-5)


def test_trainer_mesh_training_loss_decreases(tmp_path):
    """End-to-end SPMD training through the Trainer on the virtual mesh."""
    from ignnition_tpu.data.synthetic import write_dataset
    from ignnition_tpu.training import Trainer

    d = str(tmp_path / "ds")
    write_dataset(d, 2, 8, seed=4, n_links=12, n_paths=8, max_path_len=4)
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    trainer = Trainer(build(ir), padding=PaddingConfig(min_size=32))
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(data=4, model=2)
    before = trainer.evaluate(state, d, num_batches=2, batch_size=2)
    state = trainer.train(
        state, d, max_steps=25, batch_size=2, shuffle=False, log_every=0, mesh=mesh
    )
    after = trainer.evaluate(state, d, num_batches=2, batch_size=2)
    assert state.step == 25
    assert after["loss"] < before["loss"]


def test_trainer_tensorboard_writes_events(tmp_path):
    from ignnition_tpu.data.synthetic import write_dataset
    from ignnition_tpu.training import Trainer
    import os

    d = str(tmp_path / "ds")
    write_dataset(d, 1, 6, seed=5, n_links=10, n_paths=6, max_path_len=3)
    ir = parser.parse_model_description(
        routenet_description(num_iterations=1, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    trainer = Trainer(build(ir), padding=PaddingConfig(min_size=16))
    state = trainer.init_state(jax.random.PRNGKey(0))
    tb = str(tmp_path / "tb")
    trainer.train(
        state, d, max_steps=6, batch_size=2, log_every=2,
        tensorboard_dir=tb, histogram_every=3,
    )
    files = os.listdir(tb)
    assert any("tfevents" in f for f in files)


def test_dp_qsize_interleave_matches_single_device():
    """Data-parallel apply over a Q-size model: the fast-interleave
    companions must survive stacking/repadding and match single-device."""
    from helpers import qsize_description

    ir = parser.parse_model_description(
        qsize_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1, "queue_sizes": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(11)
    pad = PaddingConfig(mode="multiple", multiple=64, min_size=64)
    batches = [
        build_batch(
            [
                convert_sample(
                    make_routenet_sample(rng, 10, 8, 3, with_nodes=True), spec
                )
                for _ in range(2)
            ],
            ir,
            pad,
        )
        for _ in range(4)
    ]
    stacked, meta = stack_batches(batches, ir)
    assert "ilv_slice_path_s0m0" in stacked  # companions survive stacking
    mesh = make_mesh(data=4, model=1)
    apply_fn = make_parallel_apply(model, meta, mesh)
    preds = np.asarray(apply_fn(params, stacked))
    for i, (arrays, m) in enumerate(batches):
        want = np.asarray(model.apply(params, arrays, m))
        np.testing.assert_allclose(preds[i], want, rtol=1e-4, atol=1e-5)


def test_dp_stacking_mixed_block_batches():
    """One device batch emits block-diagonal incidence, the other doesn't
    (non-uniform graphs): stacking must drop blocks for everyone and still
    match single-device predictions."""
    ir = parser.parse_model_description(
        routenet_description(num_iterations=2, hs=8),
        {"link_capacity": 1, "traffic": 1},
    )
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    spec = SampleSpec.from_ir(ir)
    rng = np.random.default_rng(7)
    pad = PaddingConfig(mode="multiple", multiple=64, min_size=64)
    uni = [convert_sample(make_routenet_sample(rng, 14, 10, 4), spec) for _ in range(2)]
    mixed = [
        convert_sample(make_routenet_sample(rng, 14, 10, 4), spec),
        convert_sample(make_routenet_sample(rng, 12, 10, 4), spec),
    ]
    b_uni = build_batch(uni, ir, pad)
    b_mix = build_batch(mixed, ir, pad)
    assert "inc_blocks_adj_paths_links" in b_uni[0]
    assert "inc_blocks_adj_paths_links" not in b_mix[0]
    stacked, meta = stack_batches([b_uni, b_mix], ir)
    assert "inc_blocks_adj_paths_links" not in stacked
    mesh = make_mesh(data=2, model=1)
    apply_fn = make_parallel_apply(model, meta, mesh)
    preds = np.asarray(apply_fn(params, stacked))
    for i, (arrays, m) in enumerate([b_uni, b_mix]):
        want = np.asarray(model.apply(params, arrays, m))
        np.testing.assert_allclose(preds[i, : want.shape[0]], want, rtol=1e-5, atol=1e-6)
