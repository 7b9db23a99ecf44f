"""Loss functions, resolved by Keras class name.

The reference resolves the loss reflectively from `tf.keras.losses` globals
(generate_model.py:744-747). Here each supported name maps to a masked pure
function `(labels, predictions, mask) -> scalar`: with merged padded batches
the mean must run over real rows only, which reproduces the reference's
unpadded batch loss exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mean_squared_error(labels, preds, mask):
    return _masked_mean((preds - labels) ** 2, mask)


def mean_absolute_error(labels, preds, mask):
    return _masked_mean(jnp.abs(preds - labels), mask)


def mean_absolute_percentage_error(labels, preds, mask):
    denom = jnp.maximum(jnp.abs(labels), 1e-7)
    return 100.0 * _masked_mean(jnp.abs(preds - labels) / denom, mask)


def mean_squared_logarithmic_error(labels, preds, mask):
    l1 = jnp.log1p(jnp.maximum(preds, 0.0))
    l2 = jnp.log1p(jnp.maximum(labels, 0.0))
    return _masked_mean((l1 - l2) ** 2, mask)


def huber(labels, preds, mask, delta: float = 1.0):
    err = preds - labels
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    lin = abs_err - quad
    return _masked_mean(0.5 * quad**2 + delta * lin, mask)


def log_cosh(labels, preds, mask):
    # stable form |e| + log1p(exp(-2|e|)) - log 2: the naive
    # err + log1p(exp(-2 err)) overflows for err < ~-44 in f32, turning
    # the loss inf and every gradient NaN (review-found, with repro);
    # mathematically identical since log cosh is even
    err = jnp.abs(preds - labels)
    return _masked_mean(
        err + jnp.log1p(jnp.exp(-2.0 * err)) - jnp.log(2.0), mask
    )


def binary_crossentropy(labels, preds, mask):
    eps = 1e-7
    p = jnp.clip(preds, eps, 1.0 - eps)
    return _masked_mean(-(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)), mask)


def poisson(labels, preds, mask):
    # keras: mean(preds - labels * log(preds + eps)). Padding rows carry
    # unconstrained model outputs; a negative one made log() NaN and
    # NaN * mask(0) poisoned the whole masked mean (review-found) —
    # neutralize masked rows BEFORE the log; real rows are unchanged
    safe = jnp.where(mask > 0, preds, 1.0)
    return _masked_mean(safe - labels * jnp.log(safe + 1e-7), mask)


def kl_divergence(labels, preds, mask):
    # keras SUMS the per-element divergence over the feature axis (the
    # distribution support) rather than averaging — on the reference's flat
    # concatenated predictions that is a sum over all real elements
    # (keras-parity tested). The `reduction` tag below tells the sharded /
    # accumulated step builders to combine partial losses by SUM instead of
    # the mask-weighted mean every other registry loss uses.
    eps = 1e-7
    y = jnp.clip(labels, eps, 1.0)
    p = jnp.clip(preds, eps, 1.0)
    return jnp.sum(y * jnp.log(y / p) * mask)


kl_divergence.reduction = "sum"


def _hinge_labels(labels, mask, axis_names=()):
    # keras converts {0,1} labels to {-1,1} only when ALL labels are binary
    # (keras losses._maybe_convert_labels). The predicate runs over REAL
    # rows only (padding zeros must not sway it). Under sharded training the
    # check must span the WHOLE effective batch — the sharded step builders
    # pass their mesh axis names and the local predicate is AND-combined
    # with pmin, so a batch whose binary-ness differs per shard still gets
    # the serial Keras answer. (Gradient-accumulation microbatches evaluate
    # the predicate per microbatch — documented divergence for non-binary
    # labels; binary-labelled datasets, hinge's use case, are unaffected.)
    import jax

    real = mask > 0
    is_binary = jnp.all(jnp.where(real, (labels == 0.0) | (labels == 1.0), True))
    for ax in axis_names:
        is_binary = jax.lax.pmin(is_binary.astype(jnp.int32), ax) > 0
    return jnp.where(is_binary, 2.0 * labels - 1.0, labels)


def hinge(labels, preds, mask, axis_names=()):
    y = _hinge_labels(labels, mask, axis_names)
    return _masked_mean(jnp.maximum(1.0 - y * preds, 0.0), mask)


def squared_hinge(labels, preds, mask, axis_names=()):
    y = _hinge_labels(labels, mask, axis_names)
    return _masked_mean(jnp.maximum(1.0 - y * preds, 0.0) ** 2, mask)


# sharded step builders pass mesh axis names so the all-binary check is
# global (see _hinge_labels)
hinge.takes_axis_names = True
squared_hinge.takes_axis_names = True


LOSSES: Dict[str, Callable] = {
    "MeanSquaredError": mean_squared_error,
    "MeanAbsoluteError": mean_absolute_error,
    "MeanAbsolutePercentageError": mean_absolute_percentage_error,
    "MeanSquaredLogarithmicError": mean_squared_logarithmic_error,
    "Huber": huber,
    "LogCosh": log_cosh,
    "BinaryCrossentropy": binary_crossentropy,
    "Poisson": poisson,
    "KLDivergence": kl_divergence,
    "Hinge": hinge,
    "SquaredHinge": squared_hinge,
}


def get_loss(name: str) -> Callable:
    try:
        return LOSSES[name]
    except KeyError:
        raise ValueError(
            f"unknown loss '{name}'; supported: {sorted(LOSSES)}"
        ) from None


def loss_reduction(loss_fn: Callable) -> str:
    """'mean' (mask-weighted mean, the default) or 'sum' — how the sharded /
    accumulated step builders must combine partial losses."""
    return getattr(loss_fn, "reduction", "mean")
