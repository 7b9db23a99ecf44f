"""Benchmark: edges/sec/chip of the SpMM-bound message-passing training step.

Runs the flagship RouteNet model (8 MP iterations, hs=32, GRU updates,
256-256-1 readout — reference examples/Routenet/model_description.json) on a
large synthetic merged graph batch and measures full training-step
throughput in processed edge-messages per second.

The reference publishes no quantitative numbers (BASELINE.md), so
vs_baseline is the speedup over this framework's own XLA scatter-lowered
aggregation path (Pallas kernel disabled) — the direct stand-in for the
reference's `tf.math.unsorted_segment_sum` hot loop on identical hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent compilation cache (harmless here, useful elsewhere: the axon
# relay compiles server-side and writes no entries — measured, the dir
# stays empty — but on direct-attached TPU hosts repeat runs skip compiles)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ignnition_jax_cache")


def build_case(
    n_links=int(os.environ.get("BENCH_LINKS", 2048)),
    n_paths=int(os.environ.get("BENCH_PATHS", 16384)),
    path_len=8,
    hs=32,
    iterations=8,
    mutate=None,
    n_graphs=1,
    per_graph=False,
):
    import jax

    from __graft_entry__ import _flagship
    from ignnition_tpu.data import SampleSpec, build_batch
    from ignnition_tpu.data.dataset import GraphSample, AdjacencyArrays
    from ignnition_tpu.data.graph import PaddingConfig
    from ignnition_tpu.model import build
    from ignnition_tpu.training import build_optimizer, get_loss

    model_ir = _flagship(num_iterations=iterations, hs=hs, mutate=mutate)
    rng = np.random.default_rng(0)

    def one_sample():
        # direct array construction (dict-of-lists conversion would dominate
        # setup time at this scale)
        links = rng.integers(0, n_links, size=(n_paths, path_len))
        src_lp = links.reshape(-1).astype(np.int32)
        dst_lp = np.repeat(np.arange(n_paths, dtype=np.int32), path_len)
        seq_lp = np.tile(np.arange(path_len, dtype=np.int32), n_paths)
        order = np.argsort(src_lp, kind="stable")
        src_pl = dst_lp[order].copy()
        dst_pl = src_lp[order].copy()
        counts = np.bincount(dst_pl, minlength=n_links)
        seq_pl = (
            np.concatenate([np.arange(c, dtype=np.int32) for c in counts])
            if counts.sum()
            else np.zeros(0, np.int32)
        )
        return GraphSample(
            num_nodes={"link": n_links, "path": n_paths},
            features={
                "link_capacity": rng.uniform(20, 40, (n_links, 1)).astype(np.float32),
                "traffic": rng.uniform(0.2, 0.8, (n_paths, 1)).astype(np.float32),
            },
            adjacencies={
                "adj_links_paths": AdjacencyArrays(src_lp, dst_lp, seq_lp),
                "adj_paths_links": AdjacencyArrays(src_pl, dst_pl, seq_pl),
            },
            label=rng.uniform(0.1, 1.0, n_paths).astype(np.float32),
        )

    samples = [one_sample() for _ in range(n_graphs)]
    arrays, meta = build_batch(
        samples,
        model_ir,
        PaddingConfig(
            mode="multiple", multiple=256, min_size=256, per_graph=per_graph
        ),
    )
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = build_optimizer(model_ir.learning.optimizer)
    opt_state = optimizer.init(params)
    loss_fn = get_loss(model_ir.learning.loss)

    import optax

    def make_step(compute_dtype=None):
        def train_step(params, opt_state, batch):
            def loss(p):
                preds = model.apply(
                    p, batch, meta, training=True, compute_dtype=compute_dtype
                )
                return loss_fn(batch["label"], preds, batch["label_mask"])

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, l

        return train_step

    make_step.meta = meta  # for tools that need the static batch meta
    make_step.model = model
    make_step.model_ir = model_ir
    real_edges = sum(
        len(s.adjacencies[a].src_idx)
        for s in samples
        for a in ("adj_links_paths", "adj_paths_links")
    )
    edges_per_step = iterations * real_edges
    return make_step, params, opt_state, arrays, edges_per_step


def time_step(step, params, opt_state, arrays, iters=50):
    """Per-step wall time with the batch resident on device.

    Timing is fetch-based: on remote-tunnel backends `block_until_ready` can
    return before execution finishes, so the only trustworthy clock edge is a
    host value fetch. We fetch once after a 1-step run (baseline: dispatch +
    fetch latency) and once after `iters` chained dispatched steps; the
    difference divided by (iters - 1) is the real per-step time.
    """
    import jax

    arrays = jax.device_put(arrays)
    fn = jax.jit(step)

    # warm: compile + full fetch
    p, o, l = fn(params, opt_state, arrays)
    float(l)

    t0 = time.time()
    p1, o1, l1 = fn(params, opt_state, arrays)
    float(l1)
    t_base = time.time() - t0

    t0 = time.time()
    p, o = params, opt_state
    for _ in range(iters):
        p, o, l = fn(p, o, arrays)
    float(l)
    t_n = time.time() - t0
    return max(t_n - t_base, 1e-9) / (iters - 1)


_AUX_PREFIXES = (
    "row_ptr_",
    "lens_",
    "src_perm_",
    "src_row_ptr_",
    "src_sorted_",
    "dst_in_src_order_",
    "emask_src_order_",
    "slice_src_",
    "slice_sort_",
    "dense_inc_",
    "inc_blocks_",
    "bwd_slice_dst_",
    "out_lens_",
    "params_slice_",
)


def _assert_pallas_lowers():
    """On TPU, prove the Pallas segment kernel actually lowers before timing
    anything: a silent fallback to XLA scatter would ship a ~3x regression
    as a quietly-worse benchmark number (VERDICT r1). use_pallas='always'
    raises on lowering failure (ops/segment.py)."""
    import jax
    import jax.numpy as jnp

    from ignnition_tpu.ops import segment as seg

    if not seg._on_tpu():
        return
    data = jnp.ones((256, 32), jnp.float32)
    ids = jnp.repeat(jnp.arange(8, dtype=jnp.int32), 32)
    rp = jnp.arange(0, 257, 32, dtype=jnp.int32)
    out = seg.segment_sum(
        data, ids, 8, indices_are_sorted=True, use_pallas="always", row_ptr=rp
    )
    np.testing.assert_allclose(np.asarray(out), np.full((8, 32), 32.0))
    print("# pallas segment kernel lowers on this backend", flush=True)

    # the flash-GAT kernels must lower too (the attention family's number
    # rides them): uniform scores + uniform incidence -> out == row mean
    from ignnition_tpu.ops.pallas.attention_kernels import flash_gat_forward

    n_d, n_s = 8, 128
    x = jnp.tile(jnp.arange(32, dtype=jnp.bfloat16)[None, :], (n_s, 1))
    o, _ = flash_gat_forward(
        jnp.zeros((n_s,), jnp.float32), jnp.zeros((n_d,), jnp.float32),
        x, jnp.ones((n_d, n_s), jnp.bfloat16), jnp.zeros((n_d,), jnp.float32),
        td=8, ts=128,
    )
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.tile(np.arange(32)[None, :], (n_d, 1)),
        rtol=1e-2,
    )
    print("# flash attention kernel lowers on this backend", flush=True)


# --------------------------------------------------------------------------
# detail cases: the non-flagship model families the driver should track
# round-over-round (VERDICT r1 weak #6) — written to BENCH_DETAIL.json
# --------------------------------------------------------------------------


def _mutate_mlp_message(description):
    """Per-edge message MLP over concat(hs_source, hs_dest) on both stages
    (the 'per-edge message models' family, PERF.md)."""
    description["neural_networks"].append(
        {
            "nn_name": "bench_msg",
            "nn_type": "feed_forward",
            "nn_architecture": [
                {"type_layer": "Dense", "units": 32, "activation": "relu"},
                {"type_layer": "Dense", "units": 32, "activation": "None"},
            ],
        }
    )
    for stage in description["message_passing"]["stages"]:
        for mp in stage["stage_mp"]:
            for se in mp["source_entities"]:
                se["message"] = [
                    {
                        "type": "neural_network",
                        "nn_name": "bench_msg",
                        "input": ["hs_source", "hs_dest"],
                    }
                ]


def _mutate_attention(description):
    description["message_passing"]["stages"][1]["stage_mp"][0][
        "aggregation"
    ] = {"type": "attention"}


def detail_cases(iters):
    """(name -> case builder). Each returns (make_step, params, opt_state,
    arrays, edges_per_step)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))

    def qsize():
        import bench_qsize

        return bench_qsize.build_case()

    return {
        "attention": lambda: build_case(mutate=_mutate_attention),
        "mlp_message": lambda: build_case(mutate=_mutate_mlp_message),
        "qsize": qsize,
        "blocks_g4": lambda: build_case(
            n_paths=4096, n_links=512, n_graphs=4, per_graph=True
        ),
        # 4x the flagship single graph (1.05M real edges per step across
        # both directions x 4): ABOVE the 262k-row XLA gather cliff and the
        # dense-incidence cap — tracks the windowed backward + slot paths'
        # large-graph behavior round-over-round (VERDICT r3 #4). Target:
        # >=85% of flagship's per-edge throughput
        "flagship_x4": lambda: build_case(n_links=8192, n_paths=65536),
        # 8x: 2.1M real edges per direction-pair step on ONE graph — the
        # largest tracked single-graph point (r5, VERDICT r4 #5); the
        # measured capacity curve continues in tools/exp_capacity.py and
        # docs/scaling.md 'Single-chip capacity'
        "flagship_x8": lambda: build_case(n_links=16384, n_paths=131072),
    }


def _time_forward(model, meta, params, arrays, iters=50):
    """Fetch-based forward-only timing (serving path), bf16 compute."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda p, b: model.apply(p, b, meta, compute_dtype=jnp.bfloat16))

    def fetch(o):
        return float(jnp.sum(o.astype(jnp.float32)))

    fetch(f(params, arrays))  # compile
    t0 = time.time()
    fetch(f(params, arrays))
    base = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = f(params, arrays)
    fetch(out)
    return max(time.time() - t0 - base, 1e-9) / (iters - 1)


_gather_ns = None


def _calibrate_gather_ns():
    """Measure THIS chip's descriptor-bound random-row gather cost (ns/row)
    on a representative shape (262k rows from a 16k-row bf16 table — the
    flagship stage access pattern), so the apsol bound uses a measured
    constant instead of the canned default. Fetch-based timing like
    time_step; cached per process."""
    global _gather_ns
    if _gather_ns is not None:
        return _gather_ns
    import jax
    import jax.numpy as jnp

    rows, n_src, d = 262144, 16384, 32
    rng = np.random.default_rng(0)
    table = jax.device_put(
        jnp.asarray(rng.standard_normal((n_src, d)), jnp.bfloat16)
    )
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, n_src, rows), jnp.int32)
    )

    @jax.jit
    def g(t, i):
        return jnp.sum(t[i].astype(jnp.float32))

    float(g(table, idx))  # compile

    def trial(iters=30):
        t0 = time.time()
        float(g(table, idx))
        base = time.time() - t0
        t0 = time.time()
        acc = 0.0
        for _ in range(iters):
            acc = g(table, idx)
        float(acc)
        return max(time.time() - t0 - base, 1e-9) / (iters - 1)

    # min over trials: the remote tunnel's dispatch latency drifts run to
    # run (PERF.md 'Streaming H2D'); additive noise only ever inflates
    best = min(trial() for _ in range(3)) / rows * 1e9
    if not (0.3 <= best <= 4.0):
        # outside the range ever measured on this hardware class — a
        # polluted measurement would push apsol above the measured step;
        # fall back to the documented default
        print(f"# gather calibration polluted ({best:.2f} ns/row), "
              f"using default 2.0", flush=True)
        best = 2.0
    _gather_ns = best
    print(f"# gather calibration: {_gather_ns:.2f} ns/row "
          f"({rows} rows from [{n_src}, {d}] bf16)", flush=True)
    return _gather_ns


def _roofline_fields(make_step, dt):
    """Speed-of-light accounting per family (BASELINE.md target;
    utils/roofline.py conventions): % of the two-resource (HBM/MXU) bound
    and of the access-pattern-aware bound that adds the MEASURED
    descriptor-bound gather floor (calibrated on this chip, above)."""
    try:
        from ignnition_tpu.utils.roofline import HardwareSpec, roofline_report

        hw = HardwareSpec()
        try:
            hw.gather_ns_per_row = _calibrate_gather_ns()
        except Exception:
            pass  # keep the documented default
        rep = roofline_report(make_step.model_ir, make_step.meta, dt * 1e3,
                              hw=hw)
        return {
            "sol_ms": rep["sol_ms"],
            "sol_pct": rep["sol_pct"],
            "apsol_ms": rep["apsol_ms"],
            "apsol_pct": rep["apsol_pct"],
            "gather_ns": round(hw.gather_ns_per_row, 2),
            "rnn_scan_ms": rep.get("rnn_scan_ms", 0.0),
        }
    except Exception as e:  # the throughput number must never be lost to this
        return {"roofline_error": f"{type(e).__name__}: {e}"}


def run_details(iters=20, on_case=None, flagship_case=None):
    import jax
    import jax.numpy as jnp

    detail = {}
    for name, builder in detail_cases(iters).items():
        try:
            make_step, params, opt_state, arrays, edges = builder()
            dt = time_step(
                make_step(jnp.bfloat16), params, opt_state, arrays, iters=iters
            )
            detail[name] = {
                "value": round(edges / dt / 1e6, 3),
                "unit": "Medges/s/chip",
                "ms_per_step": round(dt * 1e3, 3),
                **_roofline_fields(make_step, dt),
            }
        except Exception as e:  # record the failure, don't hide the flagship
            detail[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# detail {name}: {detail[name]}", flush=True)
        if on_case is not None:
            on_case(name, detail[name])

    # serving: forward-only predict at flagship shapes (PERF.md 'Serving');
    # reuses the flagship case main() already built when available.
    # VERDICT r4 #8: alongside the absolute (which rides the tunnel's 2x
    # run-to-run dispatch drift), report the drift-immune IN-PROCESS ratio
    # exported-artifact step / direct apply — both timed the same way in
    # the same session — and run the ATTENTION model through the export
    # path too, so the flash custom-call serialization stays covered.
    try:
        if flagship_case is None:
            flagship_case = build_case()
        make_step, params, _, arrays, edges = flagship_case
        dt = _time_forward(
            make_step.model, make_step.meta, params,
            jax.device_put(arrays), iters=max(iters, 50),
        )
        row = {
            "value": round(edges / dt / 1e6, 3),
            "unit": "Medges/s/chip",
            "ms_per_step": round(dt * 1e3, 3),
        }
        try:
            ratio, dt_art = _artifact_ratio(
                make_step, params, arrays, dt, iters=max(iters, 50)
            )
            row["artifact_ms"] = round(dt_art * 1e3, 3)
            row["artifact_vs_direct"] = round(ratio, 3)
        except Exception as e:
            row["artifact_error"] = f"{type(e).__name__}: {e}"
        detail["serving_bf16"] = row
    except Exception as e:
        detail["serving_bf16"] = {"error": f"{type(e).__name__}: {e}"}
    print(f"# detail serving_bf16: {detail['serving_bf16']}", flush=True)
    if on_case is not None:
        on_case("serving_bf16", detail["serving_bf16"])

    # attention-model serving: export + reload + numerical check + timing
    try:
        make_step, params, _, arrays, edges = detail_cases(iters)[
            "attention"
        ]()
        dt = _time_forward(
            make_step.model, make_step.meta, params,
            jax.device_put(arrays), iters=max(iters, 30),
        )
        row = {
            "value": round(edges / dt / 1e6, 3),
            "unit": "Medges/s/chip",
            "ms_per_step": round(dt * 1e3, 3),
        }
        try:
            ratio, dt_art = _artifact_ratio(
                make_step, params, arrays, dt, iters=max(iters, 30)
            )
            row["artifact_ms"] = round(dt_art * 1e3, 3)
            row["artifact_vs_direct"] = round(ratio, 3)
        except Exception as e:
            row["artifact_error"] = f"{type(e).__name__}: {e}"
        detail["serving_attention_bf16"] = row
    except Exception as e:
        detail["serving_attention_bf16"] = {"error": f"{type(e).__name__}: {e}"}
    print(f"# detail serving_attention_bf16: "
          f"{detail['serving_attention_bf16']}", flush=True)
    if on_case is not None:
        on_case("serving_attention_bf16", detail["serving_attention_bf16"])
    return detail


def _artifact_ratio(make_step, params, arrays, dt_direct, iters=50):
    """Export the model to a serving artifact, reload it, verify the
    artifact's predictions against direct apply, and time the artifact's
    step with the SAME fetch-based clock. Returns (artifact/direct ratio,
    artifact dt). In-process, so tunnel dispatch drift cancels out of the
    ratio (VERDICT r4 #8)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from ignnition_tpu.serving import export_serving, load_serving

    out = tempfile.mkdtemp(prefix="ignnition_bench_serving_")
    try:
        export_serving(
            make_step.model, params, make_step.meta, arrays, out,
            compute_dtype=jnp.bfloat16,
        )
        sm = load_serving(out)
        inputs = {
            k: v for k, v in arrays.items()
            if k in sm.manifest["inputs"]
        }
        inputs = jax.device_put(inputs)
        p = jax.device_put(sm.params)

        def fetch(o):
            return float(jnp.sum(jnp.asarray(o, jnp.float32)))

        # exactness: artifact == JITTED direct apply (measured bit-exact on
        # TPU; eager op-by-op execution diverges by ~0.2 at flagship scale
        # on this backend and is NOT a valid reference)
        direct = jax.jit(
            lambda pp, b: make_step.model.apply(
                pp, b, make_step.meta, compute_dtype=jnp.bfloat16
            )
        )(params, inputs)
        art = sm._exported.call(p, inputs)
        np.testing.assert_allclose(
            np.asarray(art, np.float32), np.asarray(direct, np.float32),
            rtol=2e-2, atol=2e-2,
        )

        fetch(sm._exported.call(p, inputs))  # warm
        t0 = time.time()
        fetch(sm._exported.call(p, inputs))
        base = time.time() - t0
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = sm._exported.call(p, inputs)
        fetch(o)
        dt_art = max(time.time() - t0 - base, 1e-9) / (iters - 1)
        return dt_art / dt_direct, dt_art
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --------------------------------------------------------------------------
# sustained end-to-end training (VERDICT r4 #3): the number a user
# experiences — steps/s through Trainer.train with the real input pipeline
# — tracked round-over-round next to the device-resident step families
# --------------------------------------------------------------------------


def _training_dataset():
    """Flagship-scale streaming dataset (8 graphs of 2048 links / 16384
    paths in reference-format tar.gz archives), cached in /tmp. Returns
    (dir, real_edges_per_graph_mean). BENCH_TRAIN_LINKS/PATHS shrink it
    for smoke tests."""
    import json as _json

    n_links = int(os.environ.get("BENCH_TRAIN_LINKS", 2048))
    n_paths = int(os.environ.get("BENCH_TRAIN_PATHS", 16384))
    d = f"/tmp/ignnition_bench_train_ds_{n_links}x{n_paths}"
    marker = os.path.join(d, ".meta.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return d, _json.load(f)["edges_per_graph"]
    from ignnition_tpu.data.synthetic import make_routenet_sample, write_dataset

    write_dataset(
        d, num_archives=4, samples_per_archive=2, seed=0,
        n_links=n_links, n_paths=n_paths, max_path_len=8,
    )
    # count real (unpadded) edges the same way the samples were drawn
    rng = np.random.default_rng(0)
    edges = 0.0
    n = 0
    for _ in range(8):
        s = make_routenet_sample(rng, n_links, n_paths, 8)
        per_graph = 2 * sum(
            len(v) for v in s["adj_links_paths"].values()
        )
        edges += per_graph
        n += 1
    edges_per_graph = edges / n
    with open(marker, "w") as f:
        _json.dump({"edges_per_graph": edges_per_graph}, f)
    return d, edges_per_graph


def run_training_families(on_case=None, iterations=8):
    """Two tracked rows: train_stream (real input pipeline, workers=2,
    accumulate='auto') and train_cached_device (epoch-one device cache,
    steady state pays zero host/transfer cost). Timing: two-point
    differencing — the same Trainer runs max_steps=K1 then (fresh state)
    max_steps=K2; (K2-K1)/(t2-t1) cancels compile, cache-build and
    auto-accumulate costs, leaving the sustained per-step rate. Fetch-based
    (a param leaf is pulled after each call)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from ignnition_tpu.model import build
    from ignnition_tpu.training import Trainer

    detail = {}
    d, edges_per_graph = _training_dataset()
    model_ir = _flagship(num_iterations=iterations, hs=32)
    edges_per_step = iterations * edges_per_graph  # batch_size=1

    def sustained(cache, k1, k2, workers):
        trainer = Trainer(build(model_ir), compute_dtype=jnp.bfloat16)
        kw = dict(
            batch_size=1, shuffle=True, log_every=0,
            accumulate_steps="auto", input_workers=workers,
            cache_batches=cache,
        )

        def run(k):
            state = trainer.init_state(jax.random.PRNGKey(0))
            t0 = time.time()
            state = trainer.train(state, d, max_steps=k, **kw)
            np.asarray(jax.tree_util.tree_leaves(state.params)[0])
            return time.time() - t0

        run(2)  # compile + warm every jit path
        t1 = run(k1)
        t2 = run(k2)
        if t2 - t1 < 0.1 * t2:
            # the differenced step cost drowned in constant-cost noise
            # (cache build / archive IO variance) — retry once with 4x the
            # step counts before reporting
            t1 = run(4 * k1)
            t2 = run(4 * k2)
            k1, k2 = 4 * k1, 4 * k2
        dt = max(t2 - t1, 1e-9) / (k2 - k1)
        # one periodic-eval probe (the trainer's eval_secs path calls this
        # same evaluate; cache=True mirrors in-training throttled evals)
        te0 = time.time()
        trainer.evaluate(
            trainer.init_state(jax.random.PRNGKey(0)), d,
            num_batches=2, batch_size=1, cache=True,
        )
        eval_ms = (time.time() - te0) * 1e3
        return dt, eval_ms

    for name, cache, k1, k2, workers in (
        ("train_stream", False, 6, 18, 2),
        # device-cached steps are ~7 ms: the step window must dwarf the
        # multi-second cache-build variance that the differencing cancels
        # only in expectation
        ("train_cached_device", "device", 100, 900, 2),
    ):
        try:
            dt, eval_ms = sustained(cache, k1, k2, workers)
            detail[name] = {
                "value": round(edges_per_step / dt / 1e6, 3),
                "unit": "Medges/s/chip",
                "steps_per_s": round(1.0 / dt, 3),
                "ms_per_step": round(dt * 1e3, 3),
                "eval_probe_ms": round(eval_ms, 1),
            }
        except Exception as e:
            detail[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# detail {name}: {detail[name]}", flush=True)
        if on_case is not None:
            on_case(name, detail[name])
    return detail


def main():
    import jax.numpy as jnp

    _assert_pallas_lowers()
    make_step, params, opt_state, arrays, edges_per_step = build_case()

    # optimized path: bf16 mixed-precision compute (quality-neutral, see
    # ACCURACY.md) + host-precomputed CSR companions + Pallas kernels +
    # fused direct-assignation custom-VJP ops
    dt = time_step(
        make_step(jnp.bfloat16), params, opt_state, arrays, iters=40
    )

    # baseline: f32, no index companions — XLA lowers the aggregations to
    # gather/scatter exactly like the reference's tf.gather/scatter_nd/
    # unsorted_segment_sum hot loop (stripping the aux keys changes the
    # batch signature, so this genuinely re-traces)
    baseline_arrays = {
        k: v for k, v in arrays.items() if not any(k.startswith(p) for p in _AUX_PREFIXES)
    }
    dt_base = time_step(make_step(None), params, opt_state, baseline_arrays, iters=40)

    value = edges_per_step / dt

    # the driver parses this line — print it BEFORE the detail cases so a
    # slow remote compile in a non-flagship family can never starve it
    print(
        json.dumps(
            {
                "metric": "mp_train_step_edge_throughput",
                "value": round(value / 1e6, 3),
                "unit": "Medges/s/chip",
                "vs_baseline": round(dt_base / dt, 3),
            }
        ),
        flush=True,
    )

    # non-flagship families -> BENCH_DETAIL.json (round-over-round tracking;
    # BENCH_DETAIL=0 skips); the file is rewritten after each case so a
    # timeout keeps the completed entries
    detail = {
        "flagship": {
            "value": round(value / 1e6, 3),
            "unit": "Medges/s/chip",
            "ms_per_step": round(dt * 1e3, 3),
            "vs_baseline": round(dt_base / dt, 3),
            **_roofline_fields(make_step, dt),
        }
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")

    def flush_detail():
        with open(path, "w") as f:
            json.dump(detail, f, indent=1)

    flush_detail()
    if os.environ.get("BENCH_DETAIL", "1") != "0":
        run_details(
            on_case=lambda name, row: (
                detail.__setitem__(name, row), flush_detail()
            ),
            flagship_case=(make_step, params, opt_state, arrays,
                           edges_per_step),
        )
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        # sustained end-to-end training rows (input pipeline engaged)
        run_training_families(
            on_case=lambda name, row: (
                detail.__setitem__(name, row), flush_detail()
            )
        )


if __name__ == "__main__":
    main()
