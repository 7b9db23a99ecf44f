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
