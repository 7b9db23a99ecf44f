"""Optimizers and LR schedules, resolved by Keras class name onto optax.

The reference resolves both reflectively from `tf.keras.optimizers[.schedules]`
globals with the model description's kwargs (generate_model.py:796-818). The
same names/kwargs map here onto optax transforms/schedules.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

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
        boundaries = [int(b) for b in p["boundaries"]]
        values = [float(v) for v in p["values"]]
        scales = {b: values[i + 1] / values[i] for i, b in enumerate(boundaries)}
        return optax.piecewise_constant_schedule(values[0], scales)
    if kind == "CosineDecay":
        return optax.cosine_decay_schedule(
            init_value=float(p["initial_learning_rate"]),
            decay_steps=int(p["decay_steps"]),
            alpha=float(p.get("alpha", 0.0)),
        )
    if kind == "CosineDecayRestarts":
        return optax.sgdr_schedule(
            [
                {
                    "init_value": float(p["initial_learning_rate"]),
                    "peak_value": float(p["initial_learning_rate"]),
                    "decay_steps": int(p["first_decay_steps"]),
                    "warmup_steps": 0,
                    "end_value": float(p.get("alpha", 0.0))
                    * float(p["initial_learning_rate"]),
                }
            ]
            * 8
        )
    raise ValueError(f"unknown learning-rate schedule '{kind}'")


def build_optimizer(spec: OptimizerSpec) -> optax.GradientTransformation:
    p = {k: v for k, v in spec.params.items()}
    lr: Any
    if spec.schedule is not None:
        lr = build_schedule(spec.schedule)
    else:
        lr = float(p.pop("learning_rate", 0.001))

    kind = spec.kind
    if kind == "Adam":
        return optax.adam(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        )
    if kind == "AdamW":
        return optax.adamw(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
            weight_decay=float(p.get("weight_decay", 0.004)),
        )
    if kind == "SGD":
        momentum = float(p.get("momentum", 0.0))
        return optax.sgd(
            lr,
            momentum=momentum if momentum > 0 else None,
            nesterov=_to_bool(p.get("nesterov", False)),
        )
    if kind == "RMSprop":
        return optax.rmsprop(
            lr,
            decay=float(p.get("rho", 0.9)),
            eps=float(p.get("epsilon", 1e-7)),
            momentum=float(p.get("momentum", 0.0)),
            centered=_to_bool(p.get("centered", False)),
        )
    if kind == "Adagrad":
        return optax.adagrad(
            lr,
            initial_accumulator_value=float(p.get("initial_accumulator_value", 0.1)),
            eps=float(p.get("epsilon", 1e-7)),
        )
    if kind == "Adadelta":
        return optax.adadelta(
            lr, rho=float(p.get("rho", 0.95)), eps=float(p.get("epsilon", 1e-7))
        )
    if kind == "Adamax":
        return optax.adamax(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        )
    if kind == "Nadam":
        return optax.nadam(
            lr,
            b1=float(p.get("beta_1", 0.9)),
            b2=float(p.get("beta_2", 0.999)),
            eps=float(p.get("epsilon", 1e-7)),
        )
    raise ValueError(f"unknown optimizer '{kind}'")
