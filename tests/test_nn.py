import jax
import jax.numpy as jnp
import numpy as np

from ignnition_tpu.frontend import ir, parser
from ignnition_tpu.nn import mlp, rnn


def test_mlp_shapes_and_l2():
    spec = ir.MLPSpec(
        name="m",
        layers=(
            ir.LayerSpec(kind="Dense", units=8, activation="selu", kernel_regularizer=0.1),
            ir.LayerSpec(kind="Dense", units=3, activation=None),
        ),
    )
    params, out = mlp.init(jax.random.PRNGKey(0), spec, in_dim=5)
    assert out == 3
    x = jnp.ones((4, 5))
    y = mlp.apply(spec, params, x)
    assert y.shape == (4, 3)
    l2 = mlp.l2_loss(spec, params)
    expected = 0.1 * jnp.sum(params["layers"][0]["kernel"] ** 2)
    np.testing.assert_allclose(l2, expected, rtol=1e-6)


def test_mlp_last_unit_override():
    spec = ir.MLPSpec(
        name="m", layers=(ir.LayerSpec(kind="Dense", units=8, activation="relu"),)
    )
    params, out = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4, last_units=6)
    assert out == 6
    assert params["layers"][0]["kernel"].shape == (4, 6)


def _np_gru_step(p, x, h):
    xw = x @ np.asarray(p["kernel"]) + np.asarray(p["bias"][0])
    hw = h @ np.asarray(p["recurrent_kernel"]) + np.asarray(p["bias"][1])
    xz, xr, xh = np.split(xw, 3, -1)
    hz, hr, hh = np.split(hw, 3, -1)
    z = 1 / (1 + np.exp(-(xz + hz)))
    r = 1 / (1 + np.exp(-(xr + hr)))
    hc = np.tanh(xh + r * hh)
    return z * h + (1 - z) * hc


def test_gru_step_matches_numpy():
    spec = ir.RNNSpec(name="g", cell_type="GRU")
    params = rnn.init(jax.random.PRNGKey(1), spec, in_dim=4, units=6)
    x = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    h = np.random.default_rng(1).normal(size=(3, 6)).astype(np.float32)
    got = rnn.cell_step(spec, params, jnp.asarray(x), jnp.asarray(h))
    want = _np_gru_step(params, x, h)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_masked_update_respects_lengths():
    spec = ir.RNNSpec(name="g", cell_type="GRU")
    params = rnn.init(jax.random.PRNGKey(2), spec, in_dim=4, units=4)
    rng = np.random.default_rng(2)
    seqs = rng.normal(size=(2, 5, 4)).astype(np.float32)
    init = rng.normal(size=(2, 4)).astype(np.float32)
    lengths = jnp.asarray([3, 0])
    out = rnn.masked_update(spec, params, jnp.asarray(seqs), lengths, jnp.asarray(init))
    # row 1 has zero messages: state unchanged
    np.testing.assert_allclose(out[1], init[1], rtol=1e-6)
    # row 0: 3 steps of the cell
    h = init[0:1]
    for t in range(3):
        h = _np_gru_step(params, seqs[0:1, t], h)
    np.testing.assert_allclose(out[0], h[0], rtol=1e-5, atol=1e-6)


def test_lstm_masked_update_runs():
    spec = ir.RNNSpec(name="l", cell_type="LSTM")
    params = rnn.init(jax.random.PRNGKey(3), spec, in_dim=4, units=4)
    seqs = jnp.ones((2, 3, 4))
    out = rnn.masked_update(spec, params, seqs, jnp.asarray([3, 1]), jnp.zeros((2, 4)))
    assert out.shape == (2, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_layernorm_matches_numpy():
    spec = ir.MLPSpec(
        name="m",
        layers=(
            ir.LayerSpec(kind="Dense", units=8, activation=None),
            ir.LayerSpec(kind="LayerNormalization"),
        ),
    )
    params, out = mlp.init(jax.random.PRNGKey(3), spec, in_dim=5)
    assert out == 8
    ln = params["layers"][1]
    assert ln["gamma"].shape == (8,) and ln["beta"].shape == (8,)
    x = np.random.default_rng(3).normal(size=(4, 5)).astype(np.float32)
    y = np.asarray(mlp.apply(spec, params, jnp.asarray(x)))
    h = x @ np.asarray(params["layers"][0]["kernel"]) + np.asarray(
        params["layers"][0]["bias"]
    )
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    want = (h - mean) / np.sqrt(var + 1e-3)  # keras default epsilon
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_layernorm_scale_center_flags():
    spec = ir.MLPSpec(
        name="m",
        layers=(
            ir.LayerSpec(
                kind="LayerNormalization",
                extra={"scale": False, "center": False, "epsilon": 1e-5},
            ),
        ),
    )
    params, out = mlp.init(jax.random.PRNGKey(4), spec, in_dim=6)
    assert out == 6 and params["layers"][0] == {}
    x = np.random.default_rng(4).normal(size=(3, 6)).astype(np.float32)
    y = np.asarray(mlp.apply(spec, params, jnp.asarray(x)))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-3)


def test_activation_layer_kinds_keras_semantics():
    """LeakyReLU (keras default alpha=0.3), ReLU (max_value/negative_slope/
    threshold), ELU, Softmax as standalone layers (reference reflects over
    tf.keras.layers.<type_layer>, a_c.py:839-865)."""
    x = jnp.array([[-2.0, -0.5, 0.5, 3.0]])

    spec = ir.MLPSpec(name="m", layers=(ir.LayerSpec(kind="LeakyReLU"),))
    params, out = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4)
    np.testing.assert_allclose(
        mlp.apply(spec, params, x),
        [[-0.6, -0.15, 0.5, 3.0]], rtol=1e-6,
    )

    spec = ir.MLPSpec(
        name="m",
        layers=(ir.LayerSpec(kind="LeakyReLU", extra={"alpha": 0.1}),),
    )
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4)
    np.testing.assert_allclose(
        mlp.apply(spec, params, x), [[-0.2, -0.05, 0.5, 3.0]], rtol=1e-6
    )

    spec = ir.MLPSpec(
        name="m",
        layers=(
            ir.LayerSpec(
                kind="ReLU",
                extra={"max_value": 2.0, "negative_slope": 0.5, "threshold": 0.0},
            ),
        ),
    )
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4)
    np.testing.assert_allclose(
        mlp.apply(spec, params, x), [[-1.0, -0.25, 0.5, 2.0]], rtol=1e-6
    )

    spec = ir.MLPSpec(name="m", layers=(ir.LayerSpec(kind="ELU"),))
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4)
    np.testing.assert_allclose(
        mlp.apply(spec, params, x),
        [[np.expm1(-2.0), np.expm1(-0.5), 0.5, 3.0]], rtol=1e-5,
    )

    spec = ir.MLPSpec(name="m", layers=(ir.LayerSpec(kind="Softmax"),))
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, in_dim=4)
    y = np.asarray(mlp.apply(spec, params, x))
    np.testing.assert_allclose(y.sum(axis=-1), [1.0], rtol=1e-6)


def test_gaussian_noise_layer():
    spec = ir.MLPSpec(
        name="m", layers=(ir.LayerSpec(kind="GaussianNoise", extra={"stddev": 0.5}),)
    )
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, in_dim=3)
    x = jnp.ones((64, 3))
    # deterministic (eval) mode: identity
    np.testing.assert_array_equal(mlp.apply(spec, params, x), x)
    # training mode: additive noise with the requested scale
    y = np.asarray(
        mlp.apply(spec, params, x, deterministic=False, rng=jax.random.PRNGKey(1))
    )
    assert not np.allclose(y, np.asarray(x))
    assert 0.3 < np.std(y - np.asarray(x)) < 0.7


def test_prelu_layer():
    """PReLU: per-feature trainable alpha (zeros init == ReLU), negative
    branch scales by alpha."""
    spec = parser._parse_mlp(
        {"nn_name": "n", "nn_architecture": [{"type_layer": "PReLU"}]}, "t"
    )
    params, dim = mlp.init(jax.random.PRNGKey(0), spec, 4)
    assert dim == 4
    assert params["layers"][0]["alpha"].shape == (4,)
    x = jnp.array([[-2.0, -1.0, 1.0, 3.0]])
    # zeros alpha: negative side clamps to 0
    np.testing.assert_allclose(
        mlp.apply(spec, params, x), [[0.0, 0.0, 1.0, 3.0]]
    )
    params = {"layers": ({"alpha": jnp.array([0.5, 0.25, 0.5, 0.5])},)}
    np.testing.assert_allclose(
        mlp.apply(spec, params, x), [[-1.0, -0.25, 1.0, 3.0]]
    )


def test_alpha_dropout_layer():
    """AlphaDropout (selu companion): identity when deterministic; in
    training mode preserves mean~0 / var~1 of standard-normal inputs
    (keras formula: dropped units -> -scale*alpha, affine correction)."""
    spec = parser._parse_mlp(
        {"nn_name": "n",
         "nn_architecture": [{"type_layer": "AlphaDropout", "rate": 0.3}]},
        "t",
    )
    params, _ = mlp.init(jax.random.PRNGKey(0), spec, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 64))
    np.testing.assert_allclose(mlp.apply(spec, params, x), x)  # eval mode
    y = mlp.apply(spec, params, x, deterministic=False,
                  rng=jax.random.PRNGKey(2))
    y = np.asarray(y)
    assert abs(y.mean()) < 0.02, y.mean()
    assert abs(y.std() - 1.0) < 0.05, y.std()
    # ~rate of the units carry the (affine-transformed) dropped constant
    rate = 0.3
    alpha_p = -1.6732632423543772 * 1.0507009873554805
    a = ((1 - rate) * (1 + rate * alpha_p**2)) ** -0.5
    dropped_value = a * alpha_p + (-a * alpha_p * rate)
    frac = np.mean(np.isclose(y, dropped_value, atol=1e-5))
    assert abs(frac - rate) < 0.02, frac


def test_last_units_targets_last_dense_layer():
    """Review regression: the last_units override only applied when the
    FINAL layer was Dense — a network ending in Activation silently
    produced a wrong-width output."""
    import jax

    from ignnition_tpu.frontend import ir as IR
    from ignnition_tpu.nn import mlp as MLP

    spec = IR.MLPSpec(
        name="t",
        layers=(
            IR.LayerSpec(kind="Dense", name="d0", units=16, activation="relu"),
            IR.LayerSpec(kind="Dense", name="d1", units=4, activation=None),
            IR.LayerSpec(kind="Activation", name="a", activation="tanh"),
        ),
    )
    params, out = MLP.init(jax.random.PRNGKey(0), spec, 8, last_units=32)
    assert out == 32
    assert params["layers"][1]["kernel"].shape == (16, 32)
    assert MLP.output_dim(spec, 8, last_units=32) == 32

    no_dense = IR.MLPSpec(
        name="t2",
        layers=(IR.LayerSpec(kind="Activation", name="a", activation="relu"),),
    )
    import pytest

    with pytest.raises(ValueError, match="Dense"):
        MLP.init(jax.random.PRNGKey(0), no_dense, 8, last_units=32)
