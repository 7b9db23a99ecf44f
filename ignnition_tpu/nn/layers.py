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
    "LeakyReLU",
    "ReLU",
    "ELU",
    "Softmax",
    "GaussianNoise",
)
