"""Optimizers and LR schedules, resolved by Keras class name onto optax.

The reference resolves both reflectively from `tf.keras.optimizers[.schedules]`
globals with the model description's kwargs (generate_model.py:796-818). The
same names/kwargs map here onto optax transforms/schedules.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax.numpy as jnp
import optax

from ..frontend.ir import OptimizerSpec, ScheduleSpec


def _to_bool(v) -> bool:
    if isinstance(v, str):
        return v.lower() == "true"
    return bool(v)


def build_schedule(spec: ScheduleSpec) -> optax.Schedule:
    p = dict(spec.params)
    kind = spec.kind
    if kind == "ExponentialDecay":
        return optax.exponential_decay(
            init_value=float(p["initial_learning_rate"]),
            transition_steps=int(p["decay_steps"]),
            decay_rate=float(p["decay_rate"]),
            staircase=_to_bool(p.get("staircase", False)),
        )
    if kind == "InverseTimeDecay":
        # lr = init / (1 + rate * step / decay_steps)
        init = float(p["initial_learning_rate"])
        steps = int(p["decay_steps"])
        rate = float(p["decay_rate"])
        staircase = _to_bool(p.get("staircase", False))

        def sched(step):
            t = step // steps if staircase else step / steps
            return init / (1.0 + rate * t)

        return sched
    if kind == "PolynomialDecay":
        return optax.polynomial_schedule(
            init_value=float(p["initial_learning_rate"]),
            end_value=float(p.get("end_learning_rate", 0.0001)),
            power=float(p.get("power", 1.0)),
            transition_steps=int(p["decay_steps"]),
        )
    if kind == "PiecewiseConstantDecay":
        # keras boundary semantics are INCLUSIVE on the left value:
        # lr = values[i] while step <= boundaries[i] (keras-parity tested;
        # optax.piecewise_constant_schedule switches one step early)
        boundaries = jnp.asarray([int(b) for b in p["boundaries"]])
        values = jnp.asarray([float(v) for v in p["values"]])

        def sched(step):
            return values[jnp.sum(step > boundaries)]

        return sched
    if kind == "CosineDecay":
        return optax.cosine_decay_schedule(
            init_value=float(p["initial_learning_rate"]),
            decay_steps=int(p["decay_steps"]),
            alpha=float(p.get("alpha", 0.0)),
        )
    if kind == "CosineDecayRestarts":
        # keras closed form (SGDR, Loshchilov & Hutter): restart i runs for
        # first_decay_steps * t_mul^i steps at peak initial_lr * m_mul^i;
        # keras-parity tested against tf.keras CosineDecayRestarts
        init = float(p["initial_learning_rate"])
        t0 = float(p["first_decay_steps"])
        t_mul = float(p.get("t_mul", 2.0))
        m_mul = float(p.get("m_mul", 1.0))
        alpha = float(p.get("alpha", 0.0))

        def sched(step):
            cf = jnp.asarray(step, jnp.float32) / t0
            if t_mul == 1.0:
                i_restart = jnp.floor(cf)
                frac = cf - i_restart
            else:
                i_restart = jnp.floor(
                    jnp.log1p(-cf * (1.0 - t_mul)) / jnp.log(t_mul)
                )
                sum_r = (1.0 - t_mul**i_restart) / (1.0 - t_mul)
                frac = (cf - sum_r) / t_mul**i_restart
            m_fac = m_mul**i_restart
            cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            return init * ((1.0 - alpha) * m_fac * cosine + alpha)

        return sched
    raise ValueError(f"unknown learning-rate schedule '{kind}'")


_KNOWN_OPT_KW = {
    "Adam": {"beta_1", "beta_2", "epsilon", "amsgrad"},
    "AdamW": {"beta_1", "beta_2", "epsilon", "weight_decay"},
    "SGD": {"momentum", "nesterov"},
    "RMSprop": {"rho", "epsilon", "momentum", "centered"},
    "Adagrad": {"initial_accumulator_value", "epsilon"},
    "Adadelta": {"rho", "epsilon"},
    "Adamax": {"beta_1", "beta_2", "epsilon"},
    "Nadam": {"beta_1", "beta_2", "epsilon"},
}
# keras base-optimizer kwargs honored for every kind (clipping is chained
# BEFORE the update, exactly keras's order); 'name' is cosmetic
_COMMON_OPT_KW = {
    "learning_rate", "clipnorm", "clipvalue", "global_clipnorm", "name",
}


def _clip_per_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """keras `clipnorm`: clip each VARIABLE's gradient to max L2 norm
    (optax.clip_by_global_norm is keras's `global_clipnorm`)."""
    import jax

    def update(grads, state, params=None):
        def clip(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-30))

        return jax.tree.map(clip, grads), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def build_optimizer(spec: OptimizerSpec) -> optax.GradientTransformation:
    p = {k: v for k, v in spec.params.items()}
    kind = spec.kind
    known = _KNOWN_OPT_KW.get(kind, set()) | _COMMON_OPT_KW
    unknown = set(p) - known
    if unknown:
        # review-found: these were silently dropped before — the reference's
        # reflective tf.keras construction would have applied them, so a
        # migrated description trained with silently different semantics
        raise ValueError(
            f"unsupported {kind} option(s) {sorted(unknown)}; supported: "
            f"{sorted(known - {'name'})}"
        )
    clips = []
    clip_opts = [k for k in ("clipvalue", "clipnorm", "global_clipnorm") if k in p]
    if len(clip_opts) > 1:
        # keras base-optimizer raises here too; chaining them silently would
        # diverge from the reference's semantics without signal
        raise ValueError(
            f"at most one of clipvalue/clipnorm/global_clipnorm may be set; "
            f"got {clip_opts}"
        )
    if "clipvalue" in p:
        v = float(p.pop("clipvalue"))
        clips.append(optax.clip(v))
    if "clipnorm" in p:
        clips.append(_clip_per_leaf_norm(float(p.pop("clipnorm"))))
    if "global_clipnorm" in p:
        clips.append(optax.clip_by_global_norm(float(p.pop("global_clipnorm"))))
    lr: Any
    if spec.schedule is not None:
        lr = build_schedule(spec.schedule)
    else:
        lr = float(p.pop("learning_rate", 0.001))

    def _finish(tx):
        return optax.chain(*clips, tx) if clips else tx

    kind = spec.kind
    if kind == "Adam":
        # amsgrad rides a keras-exact implementation: optax.amsgrad maxes
        # the bias-CORRECTED second moment while keras maxes the raw one
        # (trajectories diverge ~2e-3 within 12 steps, caught by the
        # keras-parity test)
        fn = (
            _keras_adam_amsgrad
            if _to_bool(p.get("amsgrad", False))
            else optax.adam
        )
        return _finish(fn(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        ))
    if kind == "AdamW":
        return _finish(optax.adamw(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
            weight_decay=float(p.get("weight_decay", 0.004)),
        ))
    if kind == "SGD":
        momentum = float(p.get("momentum", 0.0))
        return _finish(optax.sgd(
            lr,
            momentum=momentum if momentum > 0 else None,
            nesterov=_to_bool(p.get("nesterov", False)),
        ))
    if kind == "RMSprop":
        return _finish(optax.rmsprop(
            lr,
            decay=float(p.get("rho", 0.9)),
            eps=float(p.get("epsilon", 1e-7)),
            momentum=float(p.get("momentum", 0.0)),
            centered=_to_bool(p.get("centered", False)),
            # optax's default eps_in_sqrt=True (divide by sqrt(v + eps))
            # IS the keras semantics on this stack: keras 3's rmsprop.py
            # adds epsilon to the velocity BEFORE the sqrt (line 141-145),
            # as did legacy TF — a review suggested eps_in_sqrt=False
            # "for keras parity" and the trajectory test correctly
            # rejected it (test_optimizer_trajectory_matches_keras)
        ))
    if kind == "Adagrad":
        return _finish(optax.adagrad(
            lr,
            initial_accumulator_value=float(p.get("initial_accumulator_value", 0.1)),
            eps=float(p.get("epsilon", 1e-7)),
        ))
    if kind == "Adadelta":
        return _finish(optax.adadelta(
            lr, rho=float(p.get("rho", 0.95)), eps=float(p.get("epsilon", 1e-7))
        ))
    if kind == "Adamax":
        return _finish(optax.adamax(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        ))
    if kind == "Nadam":
        # optax.nadam implements a different Nadam variant (trajectories
        # diverge ~3e-2 within 12 steps); this is keras 3's exact update
        # (keras/src/optimizers/nadam.py): momentum-schedule products
        # u_t = b1 * (1 - 0.5 * 0.96^t)
        return _finish(_keras_nadam(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        ))
    raise ValueError(f"unknown optimizer '{kind}'")


def _keras_adam_amsgrad(lr, b1: float, b2: float, eps: float):
    """Keras-semantics AMSGrad Adam (keras/src/optimizers/adam.py): the
    raw second moment is maxed BEFORE bias correction, and the correction
    rides the alpha = lr * sqrt(1-b2^t)/(1-b1^t) scaling with epsilon
    OUTSIDE the corrected sqrt."""
    import jax

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": z, "vhat": z, "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        step_lr = lr(state["t"]) if callable(lr) else lr
        alpha = step_lr * jnp.sqrt(1.0 - b2**tf_) / (1.0 - b1**tf_)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads
        )
        vhat = jax.tree.map(jnp.maximum, state["vhat"], v)
        upd = jax.tree.map(
            lambda m_, vh: -alpha * m_ / (jnp.sqrt(vh) + eps), m, vhat
        )
        return upd, {"m": m, "v": v, "vhat": vhat, "t": t}

    return optax.GradientTransformation(init, update)


def _keras_nadam(lr, b1: float, b2: float, eps: float):
    """Keras-semantics Nadam as an optax transformation (keras-parity
    tested against tf.keras.optimizers.Nadam trajectories)."""
    import jax

    def init(params):
        return {
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32),
            "u_prod": jnp.ones((), jnp.float32),
        }

    def update(grads, state, params=None):
        t = state["t"] + 1  # keras local_step
        tf_ = t.astype(jnp.float32)
        u_t = b1 * (1.0 - 0.5 * 0.96**tf_)
        u_t1 = b1 * (1.0 - 0.5 * 0.96 ** (tf_ + 1.0))
        u_prod = state["u_prod"] * u_t
        u_prod1 = u_prod * u_t1
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads
        )
        step_lr = lr(state["t"]) if callable(lr) else lr
        b2p = b2**tf_

        def upd(m_, v_, g):
            m_hat = u_t1 * m_ / (1 - u_prod1) + (1 - u_t) * g / (1 - u_prod)
            v_hat = v_ / (1 - b2p)
            return -step_lr * m_hat / (jnp.sqrt(v_hat) + eps)

        updates = jax.tree.map(upd, m, v, grads)
        return updates, {"m": m, "v": v, "t": t, "u_prod": u_prod}

    return optax.GradientTransformation(init, update)
