"""Feed-forward model: init/apply from an MLPSpec.

Functional equivalent of the reference's `Feed_forward_model.construct_tf_model`
(auxilary_classes.py:918-975): a chain of layers built from the spec, with an
optional last-layer unit override (used for update networks, whose output must
match the destination state dim — generate_model.py:343-346).

Params are a plain pytree: {"layers": ({"kernel": ..., "bias": ...} | {}, ...)}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..frontend.ir import MLPSpec
from .layers import (
    CUSTOM_LAYERS,
    activation,
    glorot_uniform,
    unsupported_layer_error,
)


def init(
    rng: jax.Array,
    spec: MLPSpec,
    in_dim: int,
    last_units: Optional[int] = None,
) -> Tuple[Dict[str, Any], int]:
    """Initialize parameters. Returns (params, output_dim).

    `last_units` overrides the LAST Dense layer's width (the reference
    forces update/readout networks to the destination state dim,
    a_c.py:918-975). Targeting the last *Dense* — not the literally-last
    layer — keeps the override effective when the network ends in a
    width-preserving layer (Activation/Dropout/...); review-found: the
    old final-layer-only check silently produced a wrong-width state."""
    params = []
    dim = in_dim
    last_dense = max(
        (j for j, l in enumerate(spec.layers) if l.kind == "Dense"),
        default=None,
    )
    if last_units is not None and last_dense is None:
        raise ValueError(
            f"network '{spec.name}' must contain a Dense layer: its output "
            f"is required to have width {last_units}"
        )
    for j, layer in enumerate(spec.layers):
        if layer.kind == "Dense":
            units = layer.units
            if j == last_dense and last_units is not None:
                units = last_units
            if units is None:
                raise ValueError(
                    f"Dense layer '{layer.name}' of network '{spec.name}' has no units"
                )
            rng, key = jax.random.split(rng)
            p = {"kernel": glorot_uniform(key, (dim, int(units)))}
            if layer.use_bias:
                p["bias"] = jnp.zeros((int(units),), jnp.float32)
            params.append(p)
            dim = int(units)
        elif layer.kind in (
            "Dropout",
            "Activation",
            "LeakyReLU",
            "ReLU",
            "ELU",
            "Softmax",
            "GaussianNoise",
            "AlphaDropout",
        ):
            params.append({})
        elif layer.kind == "PReLU":
            # keras PReLU: per-feature trainable alpha, zeros-initialized
            params.append({"alpha": jnp.zeros((dim,), jnp.float32)})
        elif layer.kind == "LayerNormalization":
            # Keras defaults: axis=-1, epsilon=1e-3, center/scale True,
            # gamma ones, beta zeros.
            p = {}
            if bool(layer.extra.get("scale", True)):
                p["gamma"] = jnp.ones((dim,), jnp.float32)
            if bool(layer.extra.get("center", True)):
                p["beta"] = jnp.zeros((dim,), jnp.float32)
            params.append(p)
        elif layer.kind == "BatchNormalization":
            # Keras defaults: gamma ones, beta zeros, moving stats (0, 1).
            # NOTE semantics: normalization always uses the stored moving
            # statistics, and they are never updated — faithfully matching
            # what the reference's estimator actually computes (its manual
            # tf.gradients path never runs the Keras update ops, so moving
            # stats stay at init; see docs/dsl.md). gamma/beta still train.
            p = {}
            if bool(layer.extra.get("scale", True)):
                p["gamma"] = jnp.ones((dim,), jnp.float32)
            if bool(layer.extra.get("center", True)):
                p["beta"] = jnp.zeros((dim,), jnp.float32)
            p["moving_mean"] = jnp.zeros((dim,), jnp.float32)
            p["moving_variance"] = jnp.ones((dim,), jnp.float32)
            params.append(p)
        elif layer.kind in CUSTOM_LAYERS:
            rng, key = jax.random.split(rng)
            p, dim = CUSTOM_LAYERS[layer.kind].init_fn(key, layer, dim)
            params.append(p)
        else:
            raise unsupported_layer_error(layer.kind, spec.name)
    return {"layers": tuple(params)}, dim


def apply(
    spec: MLPSpec,
    params: Dict[str, Any],
    x: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    return _apply_layers(
        spec.layers, params["layers"], x, deterministic=deterministic, rng=rng
    )


def can_split_first(spec: MLPSpec) -> bool:
    """True when the first layer is Dense, so `x @ kernel` decomposes over
    row-slices of the kernel (one slice per concatenated input part)."""
    return bool(spec.layers) and spec.layers[0].kind == "Dense"


def apply_from_first_preact(
    spec: MLPSpec,
    params: Dict[str, Any],
    pre: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Finish the first Dense layer (bias + activation) from its
    pre-activation `pre = x @ kernel` and run the remaining layers.

    Used by the split-first-Dense message path: when the first layer's input
    is concat(hs_source, hs_dest, edge_params), the per-part matmuls run at
    NODE rate and only their [E, units] pre-activations meet at edge rate
    (builder.py), exactly — concat([a, b]) @ K == a @ K[:da] + b @ K[da:]."""
    layer0 = spec.layers[0]
    p0 = params["layers"][0]
    x = pre
    if layer0.use_bias:
        x = x + p0["bias"]
    x = activation(layer0.activation)(x)
    return _apply_layers(
        spec.layers[1:], params["layers"][1:], x, deterministic=deterministic, rng=rng
    )


def _apply_layers(
    layers,
    param_list,
    x: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    for layer, p in zip(layers, param_list):
        if layer.kind == "Dense":
            x = x @ p["kernel"]
            if layer.use_bias:
                x = x + p["bias"]
            x = activation(layer.activation)(x)
        elif layer.kind == "Activation":
            x = activation(layer.activation or layer.extra.get("activation"))(x)
        elif layer.kind == "Dropout":
            if not deterministic and layer.rate > 0.0:
                if rng is None:
                    raise ValueError("dropout requires an rng in training mode")
                rng, key = jax.random.split(rng)
                keep = jax.random.bernoulli(key, 1.0 - layer.rate, x.shape)
                x = jnp.where(keep, x / (1.0 - layer.rate), 0.0)
        elif layer.kind == "LeakyReLU":
            # keras LeakyReLU layer default alpha=0.3 (NOT the 0.2 used by
            # the reference's attention op or jax.nn.leaky_relu's 0.01)
            x = jax.nn.leaky_relu(x, float(layer.extra.get("alpha", 0.3)))
        elif layer.kind == "ReLU":
            neg = float(layer.extra.get("negative_slope", 0.0))
            thr = float(layer.extra.get("threshold", 0.0))
            mx = layer.extra.get("max_value")
            y = jnp.where(x >= thr, x, neg * (x - thr))
            x = jnp.minimum(y, float(mx)) if mx is not None else y
        elif layer.kind == "ELU":
            x = jax.nn.elu(x, float(layer.extra.get("alpha", 1.0)))
        elif layer.kind == "PReLU":
            x = jnp.where(x >= 0, x, p["alpha"] * x)
        elif layer.kind == "AlphaDropout":
            # keras AlphaDropout (the selu-companion dropout): dropped units
            # are set to alpha' = -selu_scale*selu_alpha, then an affine
            # correction restores zero mean / unit variance
            if not deterministic and layer.rate > 0.0:
                if rng is None:
                    raise ValueError(
                        "AlphaDropout requires an rng in training mode"
                    )
                rng, key = jax.random.split(rng)
                rate = float(layer.rate)
                alpha_p = -1.6732632423543772 * 1.0507009873554805
                keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
                a = ((1.0 - rate) * (1.0 + rate * alpha_p**2)) ** -0.5
                b = -a * alpha_p * rate
                x = a * jnp.where(keep, x, alpha_p) + b
        elif layer.kind == "Softmax":
            x = jax.nn.softmax(x, axis=int(layer.extra.get("axis", -1)))
        elif layer.kind == "GaussianNoise":
            if not deterministic:
                if rng is None:
                    raise ValueError(
                        "GaussianNoise requires an rng in training mode"
                    )
                rng, key = jax.random.split(rng)
                x = x + float(layer.extra.get("stddev", 0.0)) * (
                    jax.random.normal(key, x.shape, x.dtype)
                )
        elif layer.kind == "LayerNormalization":
            eps = float(layer.extra.get("epsilon", 1e-3))
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + eps)
            if "gamma" in p:
                x = x * p["gamma"]
            if "beta" in p:
                x = x + p["beta"]
        elif layer.kind == "BatchNormalization":
            # moving-stat normalization only (see init; keras epsilon 1e-3).
            # stop_gradient marks the moving stats non-trainable: their
            # cotangents are exactly zero, so the optimizer never moves them
            eps = float(layer.extra.get("epsilon", 1e-3))
            mm = jax.lax.stop_gradient(p["moving_mean"])
            mv = jax.lax.stop_gradient(p["moving_variance"])
            x = (x - mm) * jax.lax.rsqrt(mv + eps)
            if "gamma" in p:
                x = x * p["gamma"]
            if "beta" in p:
                x = x + p["beta"]
        elif layer.kind in CUSTOM_LAYERS:
            x = CUSTOM_LAYERS[layer.kind].apply_fn(
                layer, p, x, deterministic=deterministic, rng=rng
            )
    return x


def can_factor_last(spec: MLPSpec) -> bool:
    """True when the network ends in a LINEAR Dense layer: f(x) = g(x) @ K
    + b with g = all preceding layers. A sum aggregation then commutes with
    the last layer — sum_e f(x_e) = (sum_e g(x_e)) @ K + count * b — moving
    the final matmul (and its backward) from EDGE rate to NODE rate
    (builder.py per-edge message factoring)."""
    if not spec.layers:
        return False
    last = spec.layers[-1]
    return last.kind == "Dense" and (
        last.activation is None or last.activation == "linear"
    )


def apply_prefix(
    spec: MLPSpec,
    params: Dict[str, Any],
    x: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """All layers except the last (see can_factor_last)."""
    return _apply_layers(
        spec.layers[:-1], params["layers"][:-1], x,
        deterministic=deterministic, rng=rng,
    )


def prefix_from_first_preact(
    spec: MLPSpec,
    params: Dict[str, Any],
    pre: jnp.ndarray,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Finish layer 0 from its pre-activation and run layers 1..n-2
    (split-first-Dense + factored-last combined)."""
    layer0 = spec.layers[0]
    p0 = params["layers"][0]
    x = pre
    if layer0.use_bias:
        x = x + p0["bias"]
    x = activation(layer0.activation)(x)
    return _apply_layers(
        spec.layers[1:-1], params["layers"][1:-1], x,
        deterministic=deterministic, rng=rng,
    )


def last_dense(spec: MLPSpec, params: Dict[str, Any]):
    """(kernel, bias | None) of the final Dense layer (see can_factor_last)."""
    p = params["layers"][-1]
    return p["kernel"], (p["bias"] if spec.layers[-1].use_bias else None)


def l2_loss(spec: MLPSpec, params: Dict[str, Any]) -> jnp.ndarray:
    """Sum of kernel_regularizer * sum(kernel**2), matching keras
    `regularizers.l2` semantics (reference auxilary_classes.py:833-834)."""
    total = jnp.float32(0.0)
    for layer, p in zip(spec.layers, params["layers"]):
        if layer.kind == "Dense" and layer.kernel_regularizer > 0.0:
            total = total + layer.kernel_regularizer * jnp.sum(p["kernel"] ** 2)
    return total


def output_dim(spec: MLPSpec, in_dim: int, last_units: Optional[int] = None) -> int:
    dim = in_dim
    last_dense = max(
        (j for j, l in enumerate(spec.layers) if l.kind == "Dense"),
        default=None,
    )
    for j, layer in enumerate(spec.layers):
        if layer.kind == "Dense":
            units = layer.units
            if j == last_dense and last_units is not None:
                units = last_units
            dim = int(units)
        elif layer.kind in CUSTOM_LAYERS and layer.units is not None:
            # dim-changing custom layers declare 'units' in the description
            # so widths are known statically (before params exist)
            dim = int(layer.units)
    return dim
