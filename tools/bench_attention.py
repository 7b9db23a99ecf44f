"""A/B the attention aggregation: dense incidence path vs per-edge
segment-softmax path, at flagship shapes (stage2 = attention)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import copy
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")

import jax
import jax.numpy as jnp

import bench
from ignnition_tpu.frontend import parser as P


def main():
    # swap stage2's aggregation to attention by intercepting the parse
    real_parse = P.parse_model_description

    def patched_parse(description, dims):
        d = copy.deepcopy(description)
        d["message_passing"]["stages"][1]["stage_mp"][0]["aggregation"] = {
            "type": "attention"
        }
        return real_parse(d, dims)

    P.parse_model_description = patched_parse
    try:
        make_step, params, opt_state, arrays, edges = bench.build_case()
    finally:
        P.parse_model_description = real_parse

    arrays = jax.device_put(arrays)
    stripped = jax.device_put(
        {k: v for k, v in arrays.items() if not k.startswith("dense_inc_")}
    )
    step = make_step(jnp.bfloat16)

    def timeit(f, b, iters=30):
        p, o, l = f(params, opt_state, b)
        float(l)
        t0 = time.time()
        p, o, l = f(params, opt_state, b)
        float(l)
        base = time.time() - t0
        t0 = time.time()
        p, o = params, opt_state
        for _ in range(iters):
            p, o, l = f(p, o, b)
        float(l)
        return max(time.time() - t0 - base, 1e-9) / (iters - 1)

    f = jax.jit(step)
    dt_dense = timeit(f, arrays)
    dt_edge = timeit(f, stripped)
    print(
        f"attention dense path: {dt_dense*1e3:.3f} ms/step "
        f"({edges/dt_dense/1e6:.1f} Medges/s)"
    )
    print(
        f"attention edge  path: {dt_edge*1e3:.3f} ms/step "
        f"({edges/dt_edge/1e6:.1f} Medges/s)"
    )


if __name__ == "__main__":
    main()
