"""Parity against the ACTUAL reference implementation (TF), not oracles.

Drives /root/reference/code/utils classes directly (see tf_ref.py for the
Keras-3 shims and known reference bugs), transfers the reference models'
weights into this repo's param pytree, and asserts predictions and per-entity
hidden states allclose.

Covers: GRU/LSTM sorted+unsorted updates (a_c.py:702-796), the FFN builder
(a_c.py:918-975), and full ComnetModel forwards (generate_model.py:384-658)
over the aggregation/update/readout matrix.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

tf_mod = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from ignnition_tpu.data import SampleSpec, build_batch, convert_sample
from ignnition_tpu.data.graph import PaddingConfig
from ignnition_tpu.frontend import parser
from ignnition_tpu.frontend.ir import RNNSpec
from ignnition_tpu.model import build
from ignnition_tpu.nn import mlp as MLP
from ignnition_tpu.nn import rnn as RNN

import tf_ref
from helpers import TINY_SAMPLE, routenet_description, qsize_description, dense

ATOL = 3e-5
RTOL = 3e-5


# ==========================================================================
# Cell-level parity: recurrent updates (a_c.py:702-796)
# ==========================================================================


def _keras_gru(units, in_dim):
    ref = tf_ref.load_reference()
    cell = ref.tf.keras.layers.GRUCell(units=units)
    cell.build((None, in_dim))
    return cell


class TestRecurrentUpdates:
    N, L, D, U = 5, 4, 3, 6

    def _data(self, seed=0):
        r = np.random.RandomState(seed)
        xs = r.randn(self.N, self.L, self.D).astype(np.float32)
        h0 = r.randn(self.N, self.U).astype(np.float32)
        lens = r.randint(1, self.L + 1, self.N).astype(np.int32)
        return xs, h0, lens

    def test_gru_sorted_update(self):
        ref = tf_ref.load_reference()
        xs, h0, lens = self._data()
        cell = _keras_gru(self.U, self.D)
        rc = ref.ac.Recurrent_Cell("GRU", {})
        out_tf = rc.perform_sorted_update(
            cell, ref.tf.constant(xs), "dst", ref.tf.constant(h0),
            ref.tf.constant(lens), self.N,
        )
        p = tf_ref.rnn_params_from_keras(cell)
        out = RNN.masked_update(
            RNNSpec(name="u", cell_type="GRU"), p,
            jnp.asarray(xs), jnp.asarray(lens), jnp.asarray(h0),
        )
        np.testing.assert_allclose(np.asarray(out_tf), np.asarray(out), rtol=RTOL, atol=ATOL)

    def test_gru_unsorted_update(self):
        ref = tf_ref.load_reference()
        xs, h0, _ = self._data(1)
        x1 = xs[:, 0]
        cell = _keras_gru(self.U, self.D)
        rc = ref.ac.Recurrent_Cell("GRU", {})
        out_tf = rc.perform_unsorted_update(cell, ref.tf.constant(x1), ref.tf.constant(h0))
        p = tf_ref.rnn_params_from_keras(cell)
        out = RNN.cell_step(RNNSpec(name="u", cell_type="GRU"), p, jnp.asarray(x1), jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(out_tf), np.asarray(out), rtol=RTOL, atol=ATOL)

    def test_lstm_unsorted_update(self):
        """The reference's own LSTM update crashes (perform_unsorted_update
        passes [old_state] where LSTMCell needs [h, c], a_c.py:764 — same on
        TF 2.1). Parity is against Keras LSTMCell with this repo's documented
        interpretation: zero initial cell state."""
        ref = tf_ref.load_reference()
        xs, h0, _ = self._data(2)
        x1 = xs[:, 0]
        cell = ref.tf.keras.layers.LSTMCell(units=self.U)
        out_tf, _ = cell(
            ref.tf.constant(x1),
            [ref.tf.constant(h0), ref.tf.zeros((self.N, self.U))],
        )
        p = tf_ref.rnn_params_from_keras(cell)
        out = RNN.cell_step(RNNSpec(name="u", cell_type="LSTM"), p, jnp.asarray(x1), jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(out_tf), np.asarray(out), rtol=RTOL, atol=ATOL)

    def test_lstm_sorted_update(self):
        """Same documented divergence as above: explicit [h, c=0] initial
        state, then the reference's masked-RNN + gather-at-final_len-1
        semantics (a_c.py:785-796)."""
        ref = tf_ref.load_reference()
        xs, h0, lens = self._data(3)
        cell = ref.tf.keras.layers.LSTMCell(units=self.U)
        rnn_l = ref.tf.keras.layers.RNN(cell, return_sequences=True, return_state=True)
        res = rnn_l(
            ref.tf.constant(xs),
            initial_state=[ref.tf.constant(h0), ref.tf.zeros((self.N, self.U))],
            mask=ref.tf.sequence_mask(lens),
        )
        out_tf = np.asarray(res[0])[np.arange(self.N), lens - 1]
        p = tf_ref.rnn_params_from_keras(cell)
        out = RNN.masked_update(
            RNNSpec(name="u", cell_type="LSTM"), p,
            jnp.asarray(xs), jnp.asarray(lens), jnp.asarray(h0),
        )
        np.testing.assert_allclose(out_tf, np.asarray(out), rtol=RTOL, atol=ATOL)


# ==========================================================================
# FFN builder parity (a_c.py:918-975) over the supported layer kinds
# ==========================================================================


ARCHS = {
    "dense_chain": [
        {"type_layer": "Dense", "units": 16, "activation": "selu",
         "kernel_regularizer": "0.01"},
        {"type_layer": "Dense", "units": 8, "activation": "relu"},
        {"type_layer": "Dense", "units": 2, "activation": "None"},
    ],
    "mixed": [
        {"type_layer": "Dense", "units": 12, "activation": "tanh"},
        {"type_layer": "Dropout", "rate": 0.5},
        {"type_layer": "LeakyReLU", "alpha": 0.1},
        {"type_layer": "Dense", "units": 6, "activation": "None"},
        {"type_layer": "ELU", "alpha": 0.7},
        {"type_layer": "Softmax"},
    ],
    "layernorm": [
        {"type_layer": "Dense", "units": 10, "activation": "None"},
        {"type_layer": "LayerNormalization"},
        {"type_layer": "Activation", "activation": "sigmoid"},
        {"type_layer": "Dense", "units": 3, "activation": "None"},
    ],
    # inference-mode BN (moving stats at init, exactly what the reference's
    # estimator computes — its update ops are never fetched; docs/dsl.md)
    "batchnorm": [
        {"type_layer": "Dense", "units": 10, "activation": "relu"},
        {"type_layer": "BatchNormalization"},
        {"type_layer": "Dense", "units": 3, "activation": "None"},
    ],
    "prelu": [
        {"type_layer": "Dense", "units": 10, "activation": "None"},
        {"type_layer": "PReLU"},
        {"type_layer": "Dense", "units": 3, "activation": "None"},
    ],
}


@pytest.mark.parametrize("arch_name", sorted(ARCHS))
def test_ffn_builder_parity(arch_name):
    ref = tf_ref.load_reference()
    arch = copy.deepcopy(ARCHS[arch_name])
    ff = ref.ac.Feed_forward_model({"architecture": copy.deepcopy(arch)}, "parity")
    kmodel, _ = ff.construct_tf_model("v", 7)
    if arch_name == "prelu":
        # keras PReLU initializes alpha to zeros (== ReLU); randomize it so
        # the parity check exercises the negative branch
        for kl in kmodel.layers:
            if kl.__class__.__name__ == "PReLU":
                kl.set_weights(
                    [np.random.RandomState(6).rand(*kl.get_weights()[0].shape)
                     .astype(np.float32)]
                )
    x = np.random.RandomState(4).randn(9, 7).astype(np.float32)
    out_tf = np.asarray(kmodel(ref.tf.constant(x), training=False))

    spec = parser._parse_mlp(
        {"nn_name": "parity_nn", "nn_architecture": copy.deepcopy(arch)}, "parity"
    )
    p = tf_ref.mlp_params_from_keras(kmodel, spec)
    out = MLP.apply(spec, p, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(out_tf, np.asarray(out), rtol=RTOL, atol=ATOL)


# ==========================================================================
# Full-model parity: ComnetModel forward (generate_model.py:384-658)
# ==========================================================================


def _bigger_sample(seed=0, n_link=7, n_path=4, max_plen=4):
    """Random RouteNet-style sample: every link on >=1 path, every path >=1
    link (the reference indexes outputs[:, final_len-1] and divides by degree
    with no clamp, so empty destinations crash it)."""
    r = np.random.RandomState(seed)
    entities = {f"l{i}": "link" for i in range(n_link)}
    entities.update({f"p{i}": "path" for i in range(n_path)})
    paths = {}
    used = set()
    for pi in range(n_path):
        ln = r.randint(1, max_plen + 1)
        links = r.choice(n_link, size=ln, replace=False)
        paths[f"p{pi}"] = [f"l{li}" for li in links]
        used.update(int(x) for x in links)
    # ensure every link is on at least one path
    for li in range(n_link):
        if li not in used:
            key = f"p{r.randint(n_path)}"
            paths[key] = paths[key] + [f"l{li}"]
    inv = {f"l{i}": [] for i in range(n_link)}
    for pk, links in paths.items():
        for lk in links:
            if pk not in inv[lk]:
                inv[lk].append(pk)
    return {
        "entities": entities,
        "link_capacity": r.uniform(1, 5, n_link).round(2).tolist(),
        "traffic": r.uniform(0.1, 2, n_path).round(2).tolist(),
        "delay": r.uniform(0.1, 1, n_path).round(3).tolist(),
        "adj_links_paths": paths,
        "adj_paths_links": inv,
    }


# exact-size padding: the reference runs unpadded single graphs, and the
# replicated attention quirk (softmax over the scattered tensor's axis 0,
# a_c.py:336) makes results depend on the row count, so parity requires
# identical shapes. Shape-invariance under real padding is covered by this
# repo's own merged-batch tests.
EXACT = PaddingConfig(mode="multiple", multiple=1, min_size=1, seq_multiple=1)


def _run_both(description, dims, sample, tmp_path, repo_description=None):
    """Run reference ComnetModel and this repo's GnnModel on the same sample
    with the reference's weights. Returns (ref_pred, ref_states, pred, states,
    node counts). `repo_description` overrides the description parsed by this
    repo (used for repo-only flags like attention_softmax='reference')."""
    ref_pred, ref_states, comnet, _ = tf_ref.run_reference_model(
        description, dims, sample, tmp_path
    )

    ir = parser.parse_model_description(
        copy.deepcopy(repo_description or description), dict(dims)
    )
    model = build(ir)
    params = tf_ref.transfer_params(comnet, model)
    spec = SampleSpec.from_ir(ir)
    s = convert_sample(sample, spec)
    arrays, meta = build_batch([s], ir, EXACT)
    pred, states = model.apply(params, arrays, meta, return_states=True)

    counts = {e: int(np.sum(np.asarray(arrays[f"node_mask_{e}"]))) for e in ref_states}
    return ref_pred, ref_states, np.asarray(pred), states, counts


def _assert_model_parity(
    description, dims, sample, tmp_path, rtol=3e-4, atol=3e-5, repo_description=None
):
    ref_pred, ref_states, pred, states, counts = _run_both(
        description, dims, sample, tmp_path, repo_description=repo_description
    )
    for e, rs in ref_states.items():
        n = counts[e]
        np.testing.assert_allclose(
            rs, np.asarray(states[e])[:n], rtol=rtol, atol=atol,
            err_msg=f"final hidden states of entity '{e}' diverge",
        )
    rp = ref_pred.reshape(-1)
    np.testing.assert_allclose(
        rp, pred.reshape(-1)[: rp.shape[0]], rtol=rtol, atol=atol,
        err_msg="predictions diverge",
    )


DIMS_RN = {"link_capacity": 1, "traffic": 1,
           "adj_links_paths": 0, "adj_paths_links": 0}


@pytest.mark.parametrize("iters", [1, 3])
def test_routenet_forward_parity(iters, tmp_path):
    """Ordered link->path (GRU sorted) + sum path->link (GRU unsorted) +
    predict readout — the reference's flagship RouteNet configuration."""
    desc = routenet_description(num_iterations=iters, hs=8)
    _assert_model_parity(desc, DIMS_RN, TINY_SAMPLE, tmp_path)


def test_routenet_forward_parity_random_graph(tmp_path):
    desc = routenet_description(num_iterations=3, hs=12)
    _assert_model_parity(desc, DIMS_RN, _bigger_sample(7), tmp_path)


# --------------------------------------------------------------------------
# aggregation matrix
# --------------------------------------------------------------------------


def _single_stage_description(aggregation, hs=8, iters=2, message=None,
                              update=None, readout=None, extra_nns=()):
    """One MP: link -> path with the given aggregation; link states are never
    updated (legal: the reference runs whatever stages the JSON declares)."""
    return {
        "entities": [
            {"name": "link", "hidden_state_dimension": hs,
             "features": [{"name": "link_capacity"}]},
            {"name": "path", "hidden_state_dimension": hs,
             "features": [{"name": "traffic"}]},
        ],
        "message_passing": {
            "num_iterations": iters,
            "stages": [
                {"stage_name": "stage1",
                 "stage_mp": [
                     {"destination_entity": "path",
                      "source_entities": [
                          {"name": "link", "adj_vector": "adj_links_paths",
                           "message": copy.deepcopy(
                               message or [{"type": "direct_assignation"}])},
                      ],
                      "aggregation": copy.deepcopy(aggregation),
                      "update": copy.deepcopy(update or {
                          "type": "recurrent_neural_network",
                          "nn_name": "state_update"}),
                      },
                 ]},
            ],
        },
        "readout": copy.deepcopy(readout or [
            {"type": "predict", "input": ["path"], "label": "delay",
             "nn_name": "readout_model"},
        ]),
        "neural_networks": [
            copy.deepcopy(h) for h in
            ([*extra_nns] + [
                {"nn_name": "readout_model", "nn_type": "feed_forward",
                 "nn_architecture": [dense(16, "selu"), dense(1, "None")]},
                {"nn_name": "state_update", "nn_type": "recurrent_neural_network",
                 "recurrent_type": "GRU"},
            ])
        ],
        "learning_options": {
            "loss": "MeanSquaredError",
            "optimizer": {"type": "Adam"},
        },
    }


def test_attention_reference_quirk_parity(tmp_path):
    """The reference's GAT variant applies softmax over AXIS 0 of the
    scattered [num_dst, max_len, 1] score tensor (a_c.py:336) — including
    exp(0)=1 contributions from empty slots. This repo reproduces it under
    attention_softmax='reference' (builder.py _attention); the corrected
    per-destination softmax is the repo default and has no reference
    counterpart to compare against."""
    desc = _single_stage_description({"type": "attention"})
    repo_desc = _single_stage_description(
        {"type": "attention", "attention_softmax": "reference"}
    )
    _assert_model_parity(desc, DIMS_RN, TINY_SAMPLE, tmp_path,
                         repo_description=repo_desc)
    _assert_model_parity(desc, DIMS_RN, _bigger_sample(11), tmp_path,
                         repo_description=repo_desc)


def test_convolution_parity(tmp_path):
    """GCN-style aggregation (a_c.py:366-401): src @ kernel, segment sum,
    + dst self-loop, divide by in-degree, relu. Every path has >=1 link in
    the samples (the reference divides by degree with no zero clamp)."""
    desc = _single_stage_description({"type": "convolution"})
    _assert_model_parity(desc, DIMS_RN, TINY_SAMPLE, tmp_path)
    desc2 = _single_stage_description(
        {"type": "convolution", "activation_function": "tanh"}, iters=3
    )
    _assert_model_parity(desc2, DIMS_RN, _bigger_sample(13), tmp_path)


def test_message_nn_with_edge_params_parity(tmp_path):
    """Per-edge message MLP over concat(hs_source, hs_dest, edge_params)
    (generate_model.py:440-475), ordered aggregation + sorted GRU update.
    Exercises both the repo's split-first-Dense and concat formulations
    (they are exact-equal; tests/test_split_first_dense.py)."""
    msg_nn = {"nn_name": "msg_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(12, "relu"), dense(8, "None")]}
    desc = _single_stage_description(
        {"type": "ordered"},
        message=[{"type": "neural_network", "nn_name": "msg_nn",
                  "input": ["hs_source", "hs_dest", "edge_params"]}],
        extra_nns=[msg_nn],
    )
    sample = copy.deepcopy(TINY_SAMPLE)
    # edge params ride the adjacency as [src, params] pairs; the reference
    # generator emits them int64 and call() casts to float32 (g_m.py:454)
    sample["adj_links_paths"] = {
        "p0": [["l0", [3, 1]], ["l1", [2, 0]]],
        "p1": [["l1", [1, 4]], ["l2", [5, 2]]],
    }
    dims = dict(DIMS_RN)
    dims["adj_links_paths"] = 2
    _assert_model_parity(desc, dims, sample, tmp_path)


def test_message_nn_sum_parity(tmp_path):
    """Per-edge message MLP (linear last Dense) into a SUM aggregation —
    exercises the factored-last-Dense path (builder.py: the final matmul
    runs at node rate; exact algebra) against the reference's edge-rate
    formulation (g_m.py:440-475 + a_c.py:254-262)."""
    msg_nn = {"nn_name": "msg_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(12, "relu"), dense(8, "None")]}
    desc = _single_stage_description(
        {"type": "sum"},
        message=[{"type": "neural_network", "nn_name": "msg_nn",
                  "input": ["hs_source", "hs_dest"]}],
        extra_nns=[msg_nn],
    )
    _assert_model_parity(desc, DIMS_RN, TINY_SAMPLE, tmp_path)
    _assert_model_parity(desc, DIMS_RN, _bigger_sample(23), tmp_path)


def test_multi_source_sum_parity(tmp_path):
    """Two source entities summed into one destination: the reference
    concatenates padded blocks then reduce_sums (g_m.py:522-543, a_c.py:261);
    the repo decomposes per source. Same totals."""
    desc = qsize_description(num_iterations=2, hs=8)
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["aggregation"] = {"type": "sum"}
    sample = _qsize_sample()
    del sample["path_interleave"]
    _assert_model_parity(desc, DIMS_QS, sample, tmp_path)


def test_multi_source_ordered_parity(tmp_path):
    """Multi-source 'ordered': the reference concatenates the PADDED
    per-source blocks on the time axis and masks the first final_len steps
    (g_m.py:525-543 + a_c.py:767-796) — i.e. source-2 messages sit after
    source-1's padding slots. The repo reproduces these exact semantics
    (builder.py fast_concat / sequence path)."""
    desc = qsize_description(num_iterations=2, hs=8)
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["aggregation"] = {"type": "ordered"}
    sample = _qsize_sample()
    del sample["path_interleave"]
    _assert_model_parity(desc, DIMS_QS, sample, tmp_path)


def test_concat_axis1_parity(tmp_path):
    desc = qsize_description(num_iterations=2, hs=8)
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["aggregation"] = {"type": "concat", "concat_axis": 1}
    sample = _qsize_sample()
    del sample["path_interleave"]
    _assert_model_parity(desc, DIMS_QS, sample, tmp_path)


def test_concat_axis2_parity(tmp_path):
    """Feature-axis concat requires every source to deliver the same number
    of messages per destination (the reference tf.concat would fail
    otherwise); _qsize_sample is built that way."""
    desc = qsize_description(num_iterations=2, hs=8)
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["aggregation"] = {"type": "concat", "concat_axis": 2}
    sample = _qsize_sample(equal_counts=True)
    del sample["path_interleave"]
    _assert_model_parity(desc, DIMS_QS, sample, tmp_path)


def test_interleave_parity(tmp_path):
    """The Q-size configuration: link and node message sequences interleaved
    into one RNN input stream by the dataset-provided pattern
    (a_c.py:406-440, gen_std.py:192-219). The pattern is chosen so both
    sources fill equally many slots — the reference's tf.stack of the
    per-source index vectors (g_m.py:518) requires equal lengths."""
    desc = qsize_description(num_iterations=2, hs=8)
    _assert_model_parity(desc, DIMS_QS, _qsize_sample(equal_counts=True), tmp_path)


def test_ff_update_reference_crashes_and_component_parity(tmp_path):
    """Reference bug (documented divergence): building a feed-forward update
    crashes the reference with NameError — generate_model.py:338 reads
    `mp.message_combination` where `mp` is undefined in __init__ scope (the
    loop variable is `message`). This repo implements the documented intent:
    update_input = concat(aggregated, old_state) -> FFN with last-layer units
    overridden to the destination dim (g_m.py:343-346, 594-600). Component
    parity drives the reference FFN builder directly."""
    ref = tf_ref.load_reference()
    upd_nn = {"nn_name": "upd_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(10, "relu"), dense(4, "None")]}
    desc = _single_stage_description(
        {"type": "sum"},
        update={"type": "neural_network", "nn_name": "upd_nn"},
        extra_nns=[upd_nn],
    )
    with pytest.raises((NameError, Exception)):
        tf_ref.run_reference_model(desc, DIMS_RN, TINY_SAMPLE, tmp_path)

    # component-level: the update FFN itself (construct_tf_model with the
    # dst-dim last-layer override, a_c.py:944)
    hs, agg_dim = 8, 8
    arch = [{"type_layer": "Dense", "units": 10, "activation": "relu"},
            {"type_layer": "Dense", "units": 4, "activation": "None"}]
    ff = ref.ac.Feed_forward_model({"architecture": copy.deepcopy(arch)}, "upd")
    kmodel, _ = ff.construct_tf_model("u", agg_dim + hs, dst_dim=hs, dst_name="path")
    r = np.random.RandomState(5)
    agg = r.randn(6, agg_dim).astype(np.float32)
    old = r.randn(6, hs).astype(np.float32)
    x = np.concatenate([agg, old], 1)
    out_tf = np.asarray(kmodel(ref.tf.constant(x)))

    spec = parser._parse_mlp(
        {"nn_name": "upd_nn", "nn_architecture": copy.deepcopy(arch)}, "upd"
    )
    p = tf_ref.mlp_params_from_keras(kmodel, spec)
    out = MLP.apply(spec, p, jnp.asarray(x))
    np.testing.assert_allclose(out_tf, np.asarray(out), rtol=RTOL, atol=ATOL)


# --------------------------------------------------------------------------
# readout matrix
# --------------------------------------------------------------------------


@pytest.mark.parametrize("pooling", ["sum", "mean", "max"])
def test_readout_pooling_product_chain_parity(pooling, tmp_path):
    """neural_network -> pooling -> element_wise product -> predict
    (a_c.py:1165-1185 pooling reshapes to [1, D]; the product broadcasts it
    back over the entity rows, matching this repo's graph->entity domain
    broadcast)."""
    emb_nn = {"nn_name": "emb_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(6, "tanh")]}
    readout = [
        {"type": "neural_network", "input": ["path"], "output_name": "path_emb",
         "nn_name": "emb_nn"},
        {"type": "pooling", "type_pooling": pooling, "input": ["path_emb"],
         "output_name": "g_emb"},
        {"type": "product", "type_product": "element_wise",
         "input": ["path_emb", "g_emb"], "output_name": "scaled"},
        {"type": "predict", "input": ["scaled"], "label": "delay",
         "nn_name": "readout_model"},
    ]
    desc = _single_stage_description({"type": "sum"}, readout=readout,
                                     extra_nns=[emb_nn])
    _assert_model_parity(desc, DIMS_RN, _bigger_sample(17), tmp_path)


def test_readout_extend_adjacencies_parity(tmp_path):
    """extend_adjacencies gathers entity states out to the edge list
    (a_c.py:1236-1265) in the dataset's edge order; predict then runs per
    edge."""
    readout = [
        {"type": "extend_adjacencies", "adj_list": "adj_links_paths",
         "input": ["link", "path"],
         "output_name_src": "esrc", "output_name_dst": "edst"},
        {"type": "product", "type_product": "element_wise",
         "input": ["esrc", "edst"], "output_name": "pair"},
        {"type": "predict", "input": ["pair"], "label": "edge_label",
         "nn_name": "readout_model"},
    ]
    desc = _single_stage_description({"type": "sum"}, readout=readout)
    sample = copy.deepcopy(TINY_SAMPLE)
    sample["edge_label"] = [0.1, 0.2, 0.3, 0.4]  # one per adj_links_paths edge
    _assert_model_parity(desc, DIMS_RN, sample, tmp_path)


# --------------------------------------------------------------------------
# gradient parity: the reference's ACTUAL backward pass vs jax.grad
# --------------------------------------------------------------------------
#
# Forward parity pins the semantics; gradient parity ground-truths the entire
# backward path — every custom VJP (time-slice gathers, sorted segment-sum
# transposes, dense-incidence dot transposes, attention recompute), the
# masked-scan AD, and the factored/split message formulations — against the
# reference's own TF autodiff, leaf-for-leaf over the full parameter pytree.
# The loss is an explicit reduce_mean of squared residuals over the real
# labels on BOTH sides (loss-name reflection is covered elsewhere), plus the
# model's l2 regularization when present.


def _grad_leaves(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def _assert_gradient_parity(description, dims, sample, tmp_path,
                            rtol=2e-3, atol=2e-5, repo_description=None):
    description = copy.deepcopy(description)
    # both sides run on RAW labels (normalization is an input-pipeline map,
    # not part of the model whose backward is under test)
    for op in description["readout"]:
        op.pop("label_normalization", None)
        op.pop("label_denormalization", None)
    repo_desc = copy.deepcopy(repo_description or description)
    for op in repo_desc["readout"]:
        op.pop("label_normalization", None)
        op.pop("label_denormalization", None)

    ir = parser.parse_model_description(repo_desc, dict(dims))
    model = build(ir)
    weights, ref_grads, ref_loss, _ = tf_ref.tape_gradients(
        description, dims, sample, tmp_path, model
    )

    spec = SampleSpec.from_ir(ir)
    s = convert_sample(sample, spec)
    arrays, meta = build_batch([s], ir, EXACT)

    def loss_fn(params):
        preds = model.apply(params, arrays, meta)
        mask = arrays["label_mask"].reshape(-1)
        label = arrays["label"].reshape(-1)
        sq = jnp.square(preds.reshape(-1) - label) * mask
        return jnp.sum(sq) / jnp.sum(mask) + model.regularization_loss(params)

    loss, grads = jax.value_and_grad(loss_fn)(weights)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4,
                               err_msg="loss itself diverges")

    ref_leaves = _grad_leaves(ref_grads)
    got_leaves = _grad_leaves(grads)
    assert [p for p, _ in ref_leaves] == [p for p, _ in got_leaves]
    for (path, rg), (_, g) in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(
            np.asarray(rg), np.asarray(g, np.float32), rtol=rtol, atol=atol,
            err_msg=f"gradient diverges at {jax.tree_util.keystr(path)}",
        )


def test_grad_parity_routenet(tmp_path):
    """Flagship backward: ordered link->path (sorted GRU scan) + sum
    path->link (unsorted GRU) + l2-regularized readout, 2 iterations — the
    scan-of-scans AD path the fast gathers/segment sums transpose through."""
    desc = routenet_description(num_iterations=2, hs=8)
    _assert_gradient_parity(desc, DIMS_RN, _bigger_sample(31), tmp_path)


def test_grad_parity_attention_quirk(tmp_path):
    """Backward through the reference-quirk attention softmax (axis-0 over
    the scattered score tensor, a_c.py:336) incl. kernel1/kernel2/attn_kernel
    gradients."""
    desc = _single_stage_description({"type": "attention"})
    repo_desc = _single_stage_description(
        {"type": "attention", "attention_softmax": "reference"}
    )
    _assert_gradient_parity(desc, DIMS_RN, _bigger_sample(37), tmp_path,
                            repo_description=repo_desc)


def test_grad_parity_convolution(tmp_path):
    """GCN aggregation backward: conv kernel + degree-normalized segment-sum
    transpose (a_c.py:366-401)."""
    desc = _single_stage_description({"type": "convolution"}, iters=2)
    _assert_gradient_parity(desc, DIMS_RN, _bigger_sample(41), tmp_path)


def test_grad_parity_message_nn_ordered(tmp_path):
    """Per-edge message MLP over [hs_source, hs_dest, edge_params] into the
    ordered aggregation: gradients flow through the split-first-Dense
    formulation and both per-edge gathers' sorted transposes."""
    msg_nn = {"nn_name": "msg_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(12, "relu"), dense(8, "None")]}
    desc = _single_stage_description(
        {"type": "ordered"},
        message=[{"type": "neural_network", "nn_name": "msg_nn",
                  "input": ["hs_source", "hs_dest", "edge_params"]}],
        extra_nns=[msg_nn],
    )
    sample = copy.deepcopy(TINY_SAMPLE)
    sample["adj_links_paths"] = {
        "p0": [["l0", [3, 1]], ["l1", [2, 0]]],
        "p1": [["l1", [1, 4]], ["l2", [5, 2]]],
    }
    dims = dict(DIMS_RN)
    dims["adj_links_paths"] = 2
    _assert_gradient_parity(desc, dims, sample, tmp_path)


def test_grad_parity_message_nn_sum_factored(tmp_path):
    """Per-edge message MLP (linear last Dense) into sum — the factored-last-
    Dense path moves that layer's whole backward to node rate; its gradients
    must still equal the reference's edge-rate formulation exactly."""
    msg_nn = {"nn_name": "msg_nn", "nn_type": "feed_forward",
              "nn_architecture": [dense(12, "relu"), dense(8, "None")]}
    desc = _single_stage_description(
        {"type": "sum"},
        message=[{"type": "neural_network", "nn_name": "msg_nn",
                  "input": ["hs_source", "hs_dest"]}],
        extra_nns=[msg_nn],
    )
    _assert_gradient_parity(desc, DIMS_RN, _bigger_sample(43), tmp_path)


def test_grad_parity_interleave(tmp_path):
    """Q-size interleave backward: cotangents route through the combined
    slice maps back to BOTH source entities' message tables."""
    desc = qsize_description(num_iterations=2, hs=8)
    _assert_gradient_parity(desc, DIMS_QS, _qsize_sample(equal_counts=True),
                            tmp_path)


def test_training_trajectory_matches_reference(tmp_path):
    """Ten full training steps — reference (tf.GradientTape + keras Adam) vs
    this repo (jax.grad + the name-mapped optax Adam) from identical initial
    weights on the same graph: the loss sequences must track step for step.
    This is the end-to-end composition of the per-leaf gradient parity above
    with the optimizer-trajectory parity of test_keras_training_parity.py."""
    ref = tf_ref.load_reference()
    tf = ref.tf
    desc = routenet_description(num_iterations=2, hs=8)
    for op in desc["readout"]:
        op.pop("label_normalization", None)
    sample = _bigger_sample(47)

    mi = tf_ref.build_model_information(desc, DIMS_RN, tmp_path)
    ref.gm.set_model_info(mi)
    tensors, label = tf_ref.reference_input(sample, mi, tmp_path, training=True)
    comnet = ref.gm.ComnetModel()
    label_t = tf.constant(np.asarray(label, np.float32).reshape(-1))
    opt_tf = tf.keras.optimizers.Adam(0.01)

    # build the repo model and transfer the INITIAL weights before training
    ir = parser.parse_model_description(copy.deepcopy(desc), dict(DIMS_RN))
    model = build(ir)
    comnet(dict(tensors))  # build variables
    params = tf_ref.transfer_params(comnet, model)

    ref_losses = []
    for _ in range(10):
        with tf.GradientTape() as tape:
            pred = comnet(dict(tensors))
            loss = tf.reduce_mean(tf.square(tf.reshape(pred, [-1]) - label_t))
            if comnet.losses:
                loss = loss + tf.add_n(
                    [tf.cast(l, tf.float32) for l in comnet.losses]
                )
        grads = tape.gradient(loss, comnet.trainable_variables)
        opt_tf.apply_gradients(zip(grads, comnet.trainable_variables))
        ref_losses.append(float(loss))

    spec = SampleSpec.from_ir(ir)
    arrays, meta = build_batch([convert_sample(sample, spec)], ir, EXACT)
    import optax

    tx = optax.adam(0.01, eps=1e-7)  # keras Adam defaults
    opt_state = tx.init(params)

    def loss_fn(p):
        preds = model.apply(p, arrays, meta)
        mask = arrays["label_mask"].reshape(-1)
        sq = jnp.square(preds.reshape(-1) - arrays["label"].reshape(-1)) * mask
        return jnp.sum(sq) / jnp.sum(mask) + model.regularization_loss(p)

    got_losses = []
    for _ in range(10):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=2e-3,
                               err_msg=f"ref={ref_losses}\ngot={got_losses}")


# --------------------------------------------------------------------------
# sample builders
# --------------------------------------------------------------------------


DIMS_QS = {"link_capacity": 1, "traffic": 1, "queue_sizes": 1,
           "adj_links_paths": 0, "adj_nodes_paths": 0,
           "adj_paths_links": 0, "adj_paths_nodes": 0}


def _qsize_sample(equal_counts=False):
    """3-entity sample for the Q-size-style models. With equal_counts, every
    path has exactly 2 links and 2 nodes (needed by concat axis 2, and by the
    reference interleave whose per-source index vectors must stack)."""
    if equal_counts:
        adj_lp = {"p0": ["l0", "l1"], "p1": ["l2", "l3"]}
        adj_np = {"p0": ["n0", "n1"], "p1": ["n0", "n1"]}
    else:
        adj_lp = {"p0": ["l0", "l1"], "p1": ["l1", "l2", "l3"]}
        adj_np = {"p0": ["n0"], "p1": ["n0", "n1"]}
    inv_pl = {f"l{i}": [] for i in range(4)}
    for pk, links in adj_lp.items():
        for lk in links:
            if pk not in inv_pl[lk]:
                inv_pl[lk].append(pk)
    inv_pn = {f"n{i}": [] for i in range(2)}
    for pk, nodes in adj_np.items():
        for nk in nodes:
            if pk not in inv_pn[nk]:
                inv_pn[nk].append(pk)
    entities = {f"l{i}": "link" for i in range(4)}
    entities.update({f"p{i}": "path" for i in range(2)})
    entities.update({f"n{i}": "node" for i in range(2)})
    return {
        "entities": entities,
        "link_capacity": [10.0, 20.0, 30.0, 40.0],
        "traffic": [1.0, 2.0],
        "queue_sizes": [5.0, 7.0],
        "delay": [0.5, 0.25],
        "adj_links_paths": adj_lp,
        "adj_nodes_paths": adj_np,
        "adj_paths_links": inv_pl,
        "adj_paths_nodes": inv_pn,
        "path_interleave": ["link", "node"],
    }
