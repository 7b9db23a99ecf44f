"""Training-glue parity against actual Keras: losses, optimizers, schedules.

The reference resolves losses/optimizers/schedules reflectively from
`tf.keras` namespaces by name (generate_model.py:744-747, 796-818); this
repo maps the same names onto pure-JAX implementations. These tests
ground-truth every mapped name against the real Keras object — values for
losses/schedules, full update trajectories for optimizers — instead of
trusting a re-derivation of their math.

Found-by-these-tests (fixed): optax.nadam is a different Nadam variant than
keras (3e-2 trajectory drift in 12 steps -> custom _keras_nadam);
optax.piecewise_constant_schedule switches one step earlier than keras's
inclusive boundaries; CosineDecayRestarts needs keras's t_mul period
doubling; keras KLDivergence SUMS over elements (not means); keras hinge
converts {0,1} labels only when ALL labels are binary.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp
import optax

from ignnition_tpu.frontend.ir import OptimizerSpec, ScheduleSpec
from ignnition_tpu.training.losses import LOSSES, get_loss
from ignnition_tpu.training.optimizers import build_optimizer, build_schedule


# ==========================================================================
# losses
# ==========================================================================


def _loss_inputs(name, n=17, seed=0):
    r = np.random.RandomState(seed)
    if name in ("Hinge", "SquaredHinge"):
        y = (r.uniform(0, 1, n) > 0.5).astype(np.float32)
        p = r.uniform(-1.5, 1.5, n).astype(np.float32)
    elif name in ("BinaryCrossentropy", "KLDivergence"):
        y = r.uniform(0.05, 0.95, n).astype(np.float32)
        p = r.uniform(0.05, 0.95, n).astype(np.float32)
    else:
        y = r.uniform(0.1, 2.0, n).astype(np.float32)
        p = r.uniform(0.1, 2.0, n).astype(np.float32)
    return y, p


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_loss_matches_keras(name):
    """Each named loss equals tf.keras.losses.<Name> on flat real rows (the
    reference's concatenated-predictions shape)."""
    y, p = _loss_inputs(name)
    want = float(getattr(tf.keras.losses, name)()(y, p))
    got = float(get_loss(name)(jnp.asarray(y), jnp.asarray(p), jnp.ones(len(y))))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_loss_padding_invariant(name):
    """The masked form over a padded batch equals the unpadded keras value
    (padding rows carry zero labels/preds and zero mask)."""
    y, p = _loss_inputs(name, seed=1)
    want = float(getattr(tf.keras.losses, name)()(y, p))
    pad = 11
    yp = np.concatenate([y, np.zeros(pad, np.float32)])
    pp = np.concatenate([p, np.zeros(pad, np.float32)])
    mask = np.concatenate([np.ones(len(y), np.float32), np.zeros(pad, np.float32)])
    got = float(get_loss(name)(jnp.asarray(yp), jnp.asarray(pp), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_hinge_mixed_labels_pass_through():
    """keras converts {0,1} -> {-1,1} only when ALL labels are binary."""
    y = np.array([0.0, 0.5, 1.0], np.float32)
    p = np.array([0.3, -0.2, 0.8], np.float32)
    want = float(tf.keras.losses.Hinge()(y, p))
    got = float(get_loss("Hinge")(jnp.asarray(y), jnp.asarray(p), jnp.ones(3)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ==========================================================================
# optimizers: full trajectory parity
# ==========================================================================


OPT_CASES = {
    "Adam": {"learning_rate": 0.01},
    "AdamW": {"learning_rate": 0.01, "weight_decay": 0.004},
    "SGD": {"learning_rate": 0.01},
    "SGD_momentum": {"learning_rate": 0.01, "momentum": 0.9},
    "SGD_nesterov": {"learning_rate": 0.01, "momentum": 0.9, "nesterov": True},
    "RMSprop": {"learning_rate": 0.01},
    "Adagrad": {"learning_rate": 0.01},
    "Adadelta": {"learning_rate": 0.01},
    "Adamax": {"learning_rate": 0.01},
    "Nadam": {"learning_rate": 0.01},
    # round-4.2: keras base-optimizer kwargs (clipping chained before the
    # update; amsgrad variant) — previously silently dropped, now honored
    "Adam_amsgrad": {"learning_rate": 0.01, "amsgrad": True},
    "Adam_clipvalue": {"learning_rate": 0.01, "clipvalue": 0.5},
    "Adam_clipnorm": {"learning_rate": 0.01, "clipnorm": 1.0},
    "SGD_globalclip": {"learning_rate": 0.01, "global_clipnorm": 1.0},
}


@pytest.mark.parametrize("case", sorted(OPT_CASES))
def test_optimizer_trajectory_matches_keras(case):
    kwargs = dict(OPT_CASES[case])
    kind = case.split("_")[0]
    if case == "SGD_momentum":
        pass
    r = np.random.RandomState(3)
    w0 = r.randn(6).astype(np.float32)
    grads = [r.randn(6).astype(np.float32) for _ in range(12)]

    kkwargs = {k: v for k, v in kwargs.items()}
    keras_opt = getattr(tf.keras.optimizers, kind)(**kkwargs)
    v = tf.Variable(w0.copy())
    keras_traj = []
    for g in grads:
        keras_opt.apply_gradients([(tf.constant(g), v)])
        keras_traj.append(v.numpy().copy())

    tx = build_optimizer(OptimizerSpec(kind=kind, params=kwargs, schedule=None))
    p = jnp.asarray(w0)
    st = tx.init(p)
    for g, want in zip(grads, keras_traj):
        u, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, u)
        np.testing.assert_allclose(np.asarray(p), want, rtol=2e-5, atol=2e-6,
                                   err_msg=case)


# ==========================================================================
# LR schedules: value parity (including boundary steps)
# ==========================================================================


SCHED_CASES = [
    ("ExponentialDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 100, "decay_rate": 0.6}),
    ("ExponentialDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 100, "decay_rate": 0.6,
      "staircase": True}),
    ("InverseTimeDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 50, "decay_rate": 0.5}),
    ("InverseTimeDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 50, "decay_rate": 0.5,
      "staircase": True}),
    ("PolynomialDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 200,
      "end_learning_rate": 1e-5, "power": 2.0}),
    ("PiecewiseConstantDecay",
     {"boundaries": [30, 80], "values": [0.01, 0.005, 0.001]}),
    ("CosineDecay",
     {"initial_learning_rate": 1e-3, "decay_steps": 300, "alpha": 0.1}),
    ("CosineDecayRestarts",
     {"initial_learning_rate": 1e-3, "first_decay_steps": 50}),
    ("CosineDecayRestarts",
     {"initial_learning_rate": 1e-3, "first_decay_steps": 40, "t_mul": 1.0,
      "m_mul": 0.5, "alpha": 0.05}),
]

STEPS = [0, 1, 29, 30, 31, 49, 50, 51, 80, 81, 99, 100, 101, 149, 150,
         250, 299, 300, 350, 449, 450, 700]


@pytest.mark.parametrize("idx", range(len(SCHED_CASES)))
def test_schedule_matches_keras(idx):
    kind, params = SCHED_CASES[idx]
    keras_kwargs = dict(params)
    ks = getattr(tf.keras.optimizers.schedules, kind)(**keras_kwargs)
    ours = build_schedule(ScheduleSpec(kind=kind, params=params))
    for s in STEPS:
        want = float(ks(s))
        got = float(ours(s))
        np.testing.assert_allclose(
            got, want, rtol=3e-5, atol=1e-10,
            err_msg=f"{kind}{params} at step {s}",
        )


def test_nadam_with_schedule_matches_keras():
    """Nadam + ExponentialDecay: the schedule must be evaluated at the
    completed-step count exactly like keras does."""
    sched_params = {"initial_learning_rate": 0.01, "decay_steps": 5,
                    "decay_rate": 0.5}
    keras_opt = tf.keras.optimizers.Nadam(
        tf.keras.optimizers.schedules.ExponentialDecay(**sched_params)
    )
    r = np.random.RandomState(5)
    w0 = r.randn(4).astype(np.float32)
    grads = [r.randn(4).astype(np.float32) for _ in range(12)]
    v = tf.Variable(w0.copy())
    traj = []
    for g in grads:
        keras_opt.apply_gradients([(tf.constant(g), v)])
        traj.append(v.numpy().copy())

    tx = build_optimizer(OptimizerSpec(
        kind="Nadam", params={},
        schedule=ScheduleSpec(kind="ExponentialDecay", params=sched_params),
    ))
    p = jnp.asarray(w0)
    st = tx.init(p)
    for g, want in zip(grads, traj):
        u, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, u)
        np.testing.assert_allclose(np.asarray(p), want, rtol=2e-5, atol=2e-6)


def test_clipnorm_is_per_variable_global_clipnorm_is_global():
    """keras `clipnorm` clips each variable's gradient norm independently;
    `global_clipnorm` clips the joint norm — distinguishable only with
    several variables. Trajectories vs the real keras optimizer."""
    r = np.random.RandomState(5)
    w0a, w0b = r.randn(4).astype(np.float32), r.randn(3).astype(np.float32)
    grads = [
        (5.0 * r.randn(4).astype(np.float32),
         0.1 * r.randn(3).astype(np.float32))
        for _ in range(6)
    ]
    for key in ("clipnorm", "global_clipnorm"):
        keras_opt = tf.keras.optimizers.SGD(learning_rate=0.05, **{key: 1.0})
        va, vb = tf.Variable(w0a.copy()), tf.Variable(w0b.copy())
        traj = []
        for ga, gb in grads:
            keras_opt.apply_gradients(
                [(tf.constant(ga), va), (tf.constant(gb), vb)]
            )
            traj.append((va.numpy().copy(), vb.numpy().copy()))

        tx = build_optimizer(OptimizerSpec(
            kind="SGD", params={"learning_rate": 0.05, key: 1.0},
            schedule=None,
        ))
        params = {"a": jnp.asarray(w0a), "b": jnp.asarray(w0b)}
        st = tx.init(params)
        for (ga, gb), (wa, wb) in zip(grads, traj):
            u, st = tx.update(
                {"a": jnp.asarray(ga), "b": jnp.asarray(gb)}, st, params
            )
            params = optax.apply_updates(params, u)
            np.testing.assert_allclose(np.asarray(params["a"]), wa,
                                       rtol=2e-5, atol=2e-6, err_msg=key)
            np.testing.assert_allclose(np.asarray(params["b"]), wb,
                                       rtol=2e-5, atol=2e-6, err_msg=key)


def test_unknown_optimizer_kwarg_raises():
    """Review regression: unsupported keras optimizer options were silently
    dropped (the reference's reflective construction would apply them) —
    now a friendly error."""
    with pytest.raises(ValueError, match="use_ema"):
        build_optimizer(OptimizerSpec(
            kind="Adam", params={"learning_rate": 0.01, "use_ema": True},
            schedule=None,
        ))


def test_logcosh_stable_and_poisson_mask_safe():
    """Review regressions: log_cosh overflowed to inf/NaN-grad for
    err < -44; poisson NaN'd the masked mean when a PADDING row's
    prediction went negative. Real-row values must still match keras."""
    import jax

    from ignnition_tpu.training.losses import get_loss

    lc = get_loss("LogCosh")
    labels = jnp.asarray([50.0, 0.3]); mask = jnp.ones(2)
    val, grad = jax.value_and_grad(
        lambda pr: lc(labels, pr, mask))(jnp.asarray([0.0, 0.1]))
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))
    kval = float(tf.keras.losses.LogCosh()(labels.tolist(), [0.0, 0.1]))
    np.testing.assert_allclose(float(val), kval, rtol=1e-5)

    po = get_loss("Poisson")
    labels = jnp.asarray([1.0, 2.0, 0.0]); mask = jnp.asarray([1.0, 1.0, 0.0])
    preds = jnp.asarray([0.5, 1.5, -3.0])  # padding row negative
    val, grad = jax.value_and_grad(
        lambda pr: po(labels, pr, mask))(preds)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))
    kval = float(tf.keras.losses.Poisson()([1.0, 2.0], [0.5, 1.5]))
    np.testing.assert_allclose(float(val), kval, rtol=1e-5)


def test_multiple_clip_options_raise():
    """keras base-optimizer raises when more than one of
    clipvalue/clipnorm/global_clipnorm is set; silently chaining them would
    diverge from reference semantics (advisor-found, r4)."""
    with pytest.raises(ValueError, match="at most one of"):
        build_optimizer(OptimizerSpec(
            kind="Adam",
            params={"learning_rate": 0.01, "clipvalue": 0.5, "clipnorm": 1.0},
            schedule=None,
        ))
