"""Layer & activation registry.

The reference instantiates layers reflectively from
`tf.keras.layers.<type_layer>(**params)` (auxilary_classes.py:839-865). Here
each supported layer kind is an explicit functional implementation with the
same Keras semantics (initializers, defaults), so the same model descriptions
build the same architectures — without reflection into a framework namespace.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Activations (keras-name compatible)
# --------------------------------------------------------------------------

ACTIVATIONS: Dict[str, Callable] = {
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "leaky_relu": jax.nn.leaky_relu,
    "exponential": jnp.exp,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "linear": lambda x: x,
}


def activation(name) -> Callable:
    if name is None or name == "None" or name == "linear":
        return lambda x: x
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation '{name}'; supported: {sorted(ACTIVATIONS)}"
        ) from None


# --------------------------------------------------------------------------
# Initializers (Keras defaults)
# --------------------------------------------------------------------------


def glorot_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def orthogonal(rng, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(rng, shape, dtype)


SUPPORTED_LAYERS = (
    "Dense",
    "Dropout",
    "Activation",
    "LayerNormalization",
    "BatchNormalization",
    "LeakyReLU",
    "ReLU",
    "ELU",
    "PReLU",
    "Softmax",
    "GaussianNoise",
    "AlphaDropout",
)


# --------------------------------------------------------------------------
# Extension registry
# --------------------------------------------------------------------------
#
# The reference accepts ANY `tf.keras.layers.<type_layer>` by reflection
# (auxilary_classes.py:839-865). Reflection into a framework namespace does
# not translate to a functional JAX design, so the equivalent open surface is
# an explicit registry: users register a layer kind once and reference it
# from model descriptions like any stock kind.


class LayerDef:
    """A registered custom layer.

    init_fn(rng, layer_spec, in_dim) -> (params_dict, out_dim)
        Build the layer's parameter pytree (any dict, possibly empty) and
        report its output width. `layer_spec` is the frontend ir.LayerSpec —
        extra description keys are in `layer_spec.extra`.
    apply_fn(layer_spec, params, x, *, deterministic, rng) -> y
        Pure forward. `deterministic` is False during training (dropout-style
        layers may use `rng`).
    """

    __slots__ = ("kind", "init_fn", "apply_fn")

    def __init__(self, kind, init_fn, apply_fn):
        self.kind = kind
        self.init_fn = init_fn
        self.apply_fn = apply_fn


CUSTOM_LAYERS: Dict[str, LayerDef] = {}


def register_layer(kind: str, init_fn, apply_fn) -> None:
    """Register a custom layer kind usable from model descriptions
    (`{"type_layer": "<kind>", ...}`). Overwrites any previous registration
    of the same kind; stock kinds cannot be shadowed."""
    if kind in SUPPORTED_LAYERS:
        raise ValueError(f"cannot override built-in layer kind '{kind}'")
    CUSTOM_LAYERS[kind] = LayerDef(kind, init_fn, apply_fn)


def unsupported_layer_error(kind: str, nn_name: str) -> ValueError:
    return ValueError(
        f"unsupported layer type '{kind}' in network '{nn_name}'; "
        f"built-ins: {', '.join(SUPPORTED_LAYERS)}"
        + (
            f"; registered extensions: {', '.join(sorted(CUSTOM_LAYERS))}"
            if CUSTOM_LAYERS
            else "; custom kinds can be added with "
            "ignnition_tpu.register_layer(kind, init_fn, apply_fn)"
        )
    )
