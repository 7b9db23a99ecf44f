"""Ground-truth loader for the upstream TF reference (/root/reference).

Imports the reference's own modules (auxilary_classes / json_operations /
generate_model / generator_std_to_framework) so parity tests compare this
repo against the ACTUAL reference implementation, not a re-derived oracle.

The reference targets TF 2.1; this environment ships TF 2.21 / Keras 3, so a
few compatibility shims are applied — each preserves the TF-2.1 semantics the
reference was written against:

  * `keras.backend.dot` was removed in Keras 3. The reference only uses it on
    2-D operands (auxilary_classes.py:312,317,324,384), where it equals
    `tf.matmul`.
  * `tf.keras.layers.RNN.__call__` renamed its first argument
    `inputs` -> `sequences`; the reference calls it by keyword
    (auxilary_classes.py:788). The shim forwards the old name.
  * `tf.keras.layers.LeakyReLU(alpha=...)` still works in Keras 3 (deprecation
    warning only) — no shim needed.

Known reference bugs the tests must steer around (each is documented at its
test site):

  * LSTM updates crash in the reference itself: `perform_unsorted_update`
    passes `[old_state]` (one state) to `LSTMCell`, which indexes `states[1]`
    (a_c.py:764; same under TF 2.1). LSTM parity is therefore tested at the
    cell level against Keras directly, with this repo's documented
    zero-initial-cell-state interpretation.
  * Multi-op message chains collide in `ComnetModel.__init__`: the model-name
    counter is incremented outside the op loop (generate_model.py:281) while
    `call` increments per op (g_m.py:475), so the second op's model lookup
    fails. Full-model parity uses single-op chains; chain semantics are
    covered by this repo's own unit tests.
  * `attn_kernel` is created with shape `(2*F_dst, 1)` but applied to a
    `2*F_src`-wide input (generate_model.py:291, a_c.py:320-324): attention
    models must use message dim == destination dim to run at all.
"""

from __future__ import annotations

import io
import json
import os
import sys
import tarfile
import types

import numpy as np
import pytest

REF_UTILS = "/root/reference/code/utils"
REF_CODE = "/root/reference/code"

_cache = None


def load_reference():
    """Import the reference modules (once), applying the Keras-3 shims."""
    global _cache
    if _cache is not None:
        return _cache
    tf = pytest.importorskip("tensorflow")

    import keras.backend as KB

    if not hasattr(KB, "dot"):
        KB.dot = tf.matmul  # 2-D K.dot == matmul (see module docstring)

    if not getattr(tf.keras.layers.RNN, "_ignnition_tpu_shim", False):
        _Base = tf.keras.layers.RNN

        class _RNNCompat(_Base):
            _ignnition_tpu_shim = True

            def __call__(self, inputs=None, initial_state=None, mask=None, **kw):
                seq = kw.pop("sequences", inputs)
                return super().__call__(
                    seq, initial_state=initial_state, mask=mask, **kw
                )

        tf.keras.layers.RNN = _RNNCompat

    # generate_model.py:24 does `from main import *` to pick up user
    # normalization functions; parity tests use none, so an empty stub works.
    if "main" not in sys.modules:
        sys.modules["main"] = types.ModuleType("main")
    if REF_UTILS not in sys.path:
        sys.path.insert(0, REF_UTILS)

    import auxilary_classes as ac  # noqa: E402
    import json_operations as jo  # noqa: E402
    import generate_model as gm  # noqa: E402
    import generator_std_to_framework as gen  # noqa: E402

    _cache = types.SimpleNamespace(tf=tf, ac=ac, jo=jo, gm=gm, gen=gen)
    return _cache


def build_model_information(description: dict, dims: dict, tmp_path):
    """Run the reference front-end (schema + semantic validation + IR).

    `dims` must map every feature name to its width and every adjacency name
    to its edge-param width (the reference's find_dataset_dimensions output,
    framework_operations.py:50-91).
    """
    ref = load_reference()
    path = os.path.join(str(tmp_path), "model_description.json")
    with open(path, "w") as f:
        json.dump(description, f)
    cwd = os.getcwd()
    os.chdir(REF_CODE)  # Model_information reads './utils/schema.json'
    try:
        return ref.jo.Model_information(path, dict(dims))
    finally:
        os.chdir(cwd)


def reference_input(sample: dict, model_info, tmp_path, training=True):
    """Produce the reference model's input dict by running the reference's
    OWN generator (generator_std_to_framework.py:53-230) on a tar.gz holding
    the sample, then casting to the dtypes input_fn declares
    (generate_model.py:118-158: features float32, everything else int64).
    """
    ref = load_reference()
    tf = ref.tf
    d = os.path.join(str(tmp_path), "refdata")
    os.makedirs(d, exist_ok=True)
    payload = json.dumps([sample]).encode()
    with tarfile.open(os.path.join(d, "sample.tar.gz"), "w:gz") as tar:
        info = tarfile.TarInfo("data.json")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))

    feature_names = [f.name for f in model_info.get_all_features()]
    adjacency_info = model_info.get_adjecency_info()
    interleave_list = model_info.get_interleave_tensors()
    output_name, _, _ = model_info.get_output_info()
    additional = [
        a for a in model_info.get_additional_input_names() if a not in feature_names
    ]

    it = ref.gen.generator(
        d.encode(),
        [x.encode() for x in feature_names],
        output_name.encode(),
        [[str(x).encode() for x in a] for a in adjacency_info],
        [[str(x).encode() for x in i] for i in interleave_list],
        [x.encode() for x in additional],
        training,
    )
    got = list(it)
    # the reference generator swallows exceptions (logs + continues,
    # gen_std.py:226-230) — an empty yield means the sample was rejected
    assert got, "reference generator produced nothing (sample rejected?)"
    data, output = got[0] if training else (got[0], None)

    tensors = {}
    for k, v in data.items():
        if k in feature_names:
            tensors[k] = tf.constant(np.asarray(v, np.float32))
        else:
            tensors[k] = tf.constant(np.asarray(v, np.int64))
    label = np.asarray(output, np.float32) if training else None
    return tensors, label


def run_reference_model(description, dims, sample, tmp_path, training=False):
    """Front-end + ComnetModel forward on one sample, eagerly.

    Returns (prediction ndarray, final entity states {name: ndarray},
    the ComnetModel instance for weight extraction, the Model_information).
    """
    ref = load_reference()
    mi = build_model_information(description, dims, tmp_path)
    ref.gm.set_model_info(mi)
    tensors, _ = reference_input(sample, mi, tmp_path, training=True)
    model = ref.gm.ComnetModel()
    pred = model(dict(tensors), training=training)
    states = {
        e.name: np.asarray(model.get_global_variable(e.name + "_state"))
        for e in mi.entities
    }
    return np.asarray(pred), states, model, mi


# --------------------------------------------------------------------------
# Keras -> repo weight transfer
# --------------------------------------------------------------------------


def _read_var(v):
    """Default variable extractor: the variable's current value."""
    return np.asarray(v)


def mlp_params_from_keras(kmodel, spec, value_of=_read_var):
    """Map a reference functional-API FFN's weights onto this repo's MLP
    params pytree ({"layers": ({"kernel","bias"} | {"gamma","beta"} | {})}).

    The reference builds one keras layer per architecture entry in order
    (a_c.py:918-975), so model.layers (minus the Input layer) aligns 1:1 with
    the repo MLPSpec's layers. `value_of` maps each keras VARIABLE to the
    array placed in the pytree — the default reads its value; gradient-parity
    tests pass a tape-gradient lookup instead (same structure, so the
    resulting pytree aligns leaf-for-leaf with jax.grad's output).
    """
    import jax.numpy as jnp

    klayers = [l for l in kmodel.layers if l.__class__.__name__ != "InputLayer"]
    assert len(klayers) == len(spec.layers), (
        f"layer count mismatch: keras {len(klayers)} vs spec {len(spec.layers)}"
    )
    out = []
    for kl, sl in zip(klayers, spec.layers):
        # keras weight order: Dense [kernel, bias]; BN [gamma, beta,
        # moving_mean, moving_variance]; LN [gamma, beta]
        w = [value_of(v) for v in kl.weights]
        if sl.kind == "Dense":
            p = {"kernel": jnp.asarray(w[0])}
            if sl.use_bias:
                p["bias"] = jnp.asarray(w[1])
            out.append(p)
        elif sl.kind == "BatchNormalization":
            p = {}
            i = 0
            if bool(sl.extra.get("scale", True)):
                p["gamma"] = jnp.asarray(w[i])
                i += 1
            if bool(sl.extra.get("center", True)):
                p["beta"] = jnp.asarray(w[i])
                i += 1
            p["moving_mean"] = jnp.asarray(w[i])
            p["moving_variance"] = jnp.asarray(w[i + 1])
            out.append(p)
        elif sl.kind == "PReLU":
            out.append({"alpha": jnp.asarray(np.reshape(w[0], (-1,)))})
        elif sl.kind == "LayerNormalization":
            p = {}
            i = 0
            if bool(sl.extra.get("scale", True)):
                p["gamma"] = jnp.asarray(w[i])
                i += 1
            if bool(sl.extra.get("center", True)):
                p["beta"] = jnp.asarray(w[i])
            out.append(p)
        else:
            out.append({})
    return {"layers": tuple(out)}


def rnn_params_from_keras(cell, value_of=_read_var):
    """Keras {GRU,LSTM}Cell weights -> repo rnn params. Keras GRUCell
    (reset_after=True, the TF2 default the reference inherits) stores
    [kernel (in,3u), recurrent_kernel (u,3u), bias (2,3u)]; LSTMCell stores
    [kernel (in,4u), recurrent_kernel (u,4u), bias (4u,)] — identical layouts
    to ignnition_tpu.nn.rnn.init."""
    import jax.numpy as jnp

    w = [value_of(v) for v in cell.weights]
    return {
        "kernel": jnp.asarray(w[0]),
        "recurrent_kernel": jnp.asarray(w[1]),
        "bias": jnp.asarray(w[2]),
    }


def transfer_params(comnet, repo_model, value_of=_read_var):
    """Build this repo's full parameter pytree from a (built) reference
    ComnetModel's weights, following the reference's attribute registry
    (generate_model.py:245-382, 676-694). With the default `value_of` the
    result is the repo param pytree carrying the reference's weights; with a
    gradient lookup it is the reference's GRADIENT pytree in the same
    structure (see tape_gradients)."""
    import jax.numpy as jnp

    ir = repo_model.ir
    params = {"message": {}, "aggregation": {}, "update": {}, "readout": {}}
    for si, stage in enumerate(ir.stages):
        for mi_, mp in enumerate(stage.passes):
            dst = mp.destination
            for ki, src in enumerate(mp.sources):
                for oi, op in enumerate(src.ops):
                    if op.kind != "mlp":
                        continue
                    # counter bug: __init__ names every op model ..._0
                    # (generate_model.py:281) — single-op chains only
                    assert oi == 0, "reference cannot run multi-op chains"
                    kmodel = getattr(
                        comnet, f"{src.entity}_to_{dst}_message_creation_0"
                    )
                    params["message"][f"s{si}/m{mi_}/src{ki}/op{oi}"] = (
                        mlp_params_from_keras(kmodel, op.mlp, value_of)
                    )
            agg = mp.aggregation
            if agg.kind == "attention":
                params["aggregation"][f"s{si}/m{mi_}"] = {
                    "kernel1": jnp.asarray(value_of(comnet.kernel1)),
                    "kernel2": jnp.asarray(value_of(comnet.kernel2)),
                    "attn_kernel": jnp.asarray(value_of(comnet.attn_kernel)),
                }
            elif agg.kind == "convolution":
                params["aggregation"][f"s{si}/m{mi_}"] = {
                    "kernel": jnp.asarray(value_of(comnet.conv_kernel)),
                }
            if mp.update.kind == "recurrent":
                cell = getattr(comnet, f"{dst}_update")
                params["update"][f"{dst}_update"] = rnn_params_from_keras(
                    cell, value_of
                )
            else:
                kmodel = getattr(comnet, f"{dst}_ff_update")
                params["update"][f"{dst}_ff_update"] = mlp_params_from_keras(
                    kmodel, mp.update.mlp, value_of
                )
    for i, op in enumerate(ir.readout):
        if op.kind in ("predict", "neural_network"):
            kmodel = getattr(comnet, f"readout_model_{i}")
            params["readout"][f"op{i}"] = mlp_params_from_keras(
                kmodel, op.mlp, value_of
            )
    return params


def tape_gradients(description, dims, sample, tmp_path, repo_model):
    """Ground-truth gradient extraction: run the reference ComnetModel forward
    under tf.GradientTape, take d(mean squared error over real labels)/d(all
    variables), and return (weights pytree, gradient pytree, ref loss,
    ref predictions) — both pytrees in this repo's parameter structure, so
    they compare leaf-for-leaf against jax.grad of the transferred model.

    The loss is written explicitly (reduce_mean of squared residuals over the
    flattened real predictions) on BOTH sides rather than through the loss
    registries — the object under test is the backward pass through the model
    (scatter/gather/segment/scan transposes), not loss-name reflection (which
    tests/test_training.py covers). `sum(model.losses)` (l2 regularization,
    generate_model.py:744-753) is included when present.
    """
    ref = load_reference()
    tf = ref.tf
    mi = build_model_information(description, dims, tmp_path)
    ref.gm.set_model_info(mi)
    tensors, label = reference_input(sample, mi, tmp_path, training=True)
    model = ref.gm.ComnetModel()
    label_t = tf.constant(np.asarray(label, np.float32).reshape(-1))
    with tf.GradientTape() as tape:
        pred = model(dict(tensors))
        flat = tf.reshape(pred, [-1])
        loss = tf.reduce_mean(tf.square(flat - label_t))
        if model.losses:
            loss = loss + tf.add_n([tf.cast(l, tf.float32) for l in model.losses])
    variables = model.trainable_variables
    grads = tape.gradient(loss, variables)
    # keras-3 Variables have no .ref(); identity is the stable key
    grad_map = {id(v): g for v, g in zip(variables, grads)}

    def grad_of(v):
        g = grad_map.get(id(v))
        if g is None:  # unconnected (e.g. BN moving stats) -> zero cotangent
            return np.zeros(v.shape, np.float32)
        return np.asarray(tf.convert_to_tensor(g))

    weights = transfer_params(model, repo_model)
    gradients = transfer_params(model, repo_model, grad_of)
    return weights, gradients, float(loss), np.asarray(pred)
