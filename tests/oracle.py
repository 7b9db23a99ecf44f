"""Dense numpy reference implementations (reference-semantics oracles)."""

import jax
import numpy as np


def to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def gru(p, x, h):
    xw = x @ p["kernel"] + p["bias"][0]
    hw = h @ p["recurrent_kernel"] + p["bias"][1]
    xz, xr, xh = np.split(xw, 3, -1)
    hz, hr, hh = np.split(hw, 3, -1)
    z = 1 / (1 + np.exp(-(xz + hz)))
    r = 1 / (1 + np.exp(-(xr + hr)))
    return z * h + (1 - z) * np.tanh(xh + r * hh)


def selu(x):
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    return scale * np.where(x > 0, x, alpha * (np.exp(x) - 1))


def relu(x):
    return np.maximum(x, 0)


def leaky_relu(x, alpha=0.2):
    return np.where(x > 0, x, alpha * x)


ACT = {"selu": selu, "relu": relu, None: lambda x: x, "None": lambda x: x,
       "tanh": np.tanh, "sigmoid": lambda x: 1 / (1 + np.exp(-x))}


def mlp(params, x, activations):
    """params: {'layers': [{'kernel','bias'},...]}, activations: list of names."""
    for lp, act in zip(params["layers"], activations):
        x = x @ lp["kernel"]
        if "bias" in lp:
            x = x + lp["bias"]
        x = ACT[act](x)
    return x


def segment_softmax_dense(scores, dst, n):
    """Per-destination softmax over edge scores."""
    out = np.zeros_like(scores)
    for d in range(n):
        idx = np.where(dst == d)[0]
        if len(idx) == 0:
            continue
        s = scores[idx]
        e = np.exp(s - s.max())
        out[idx] = e / e.sum()
    return out
