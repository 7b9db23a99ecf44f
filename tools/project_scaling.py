"""Predicted multi-chip scaling efficiency of v2 destination sharding
(docs/scaling.md; VERDICT r2 'Next round' #8, r3 #2/#3).

Real >=2-chip hardware is unavailable here, so the prediction composes
quantities that ARE measurable/derivable now:

  * t_comp(m) = measured single-chip step time (BENCH_DETAIL.json flagship)
    scaled by 1/m — ideal compute split (destination sharding divides edges
    and node rows evenly; the diagnostic in __graft_entry__ verifies the
    per-shard working set is 1/m);
  * t_comm(m) = actual halo volume of the partitioned flagship-scale batch
    (partition_batch at 2048 links / 16384 paths / 262k edges per
    direction) over v5e ICI bandwidth, plus a per-collective latency term
    (2 adjacencies x 8 iterations x all_to_all);
  * overlap credit: the interior fraction of the per-iteration source
    gather can hide under the collective (builder._halo_gather); hidden
    time = min(t_comm_iter, interior_gather_time), with the gather cost at
    the BENCH-CALIBRATED descriptor floor (BENCH_DETAIL.json `gather_ns`,
    the same constant the roofline uses — NOT a best-case figure).

Efficiency(m) = t_comp(m) / (t_comp(m) + max(t_comm(m) - hidden, 0)).

Three regimes, every row using the cut the locality partitioner
(parallel/locality.py) actually MEASURES on the partitioned batch:

  * ``random``          — random path->link incidence, dataset row order
                          (worst case: what shipping the batch straight to
                          partition_batch gives);
  * ``random_reordered``— same graph through locality_order/reorder_sample
                          (what a deployment runs; expander-like incidence
                          bounds what any partitioner can recover);
  * ``local_recovered`` — latent-window incidence with SCRAMBLED ids,
                          recovered by the partitioner. This replaces the
                          old assumed-sorted "local" regime: the cut is
                          measured from the reordered partition, not from a
                          synthetic pre-sorted layout.

Usage: python -m tools.project_scaling [--ms-per-step 7.55]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e ICI: 2D torus, per-link ~45 GB/s one-way usable; a same-host slice
# exposes 4 links. Override for other topologies.
ICI_GBPS = float(os.environ.get("IGNNITION_TPU_ICI_GBPS", 45.0))
ICI_LINKS = int(os.environ.get("IGNNITION_TPU_ICI_LINKS", 4))
COLLECTIVE_LAT_US = float(os.environ.get("IGNNITION_TPU_COLL_LAT_US", 10.0))


def _bench_detail() -> dict:
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    with open(path) as f:
        return json.load(f)


def calibrated_gather_ns() -> float:
    """The on-chip-calibrated descriptor-floor gather cost (ns/row) recorded
    by the last bench run (bench.py _calibrate_gather_ns). Falls back to the
    conservative 2.0 ns/row of PERF.md's typical measurement — never to the
    0.76 best-case small-table figure."""
    env = os.environ.get("IGNNITION_TPU_GATHER_NS")
    if env:
        return float(env)
    try:
        return float(_bench_detail()["flagship"]["gather_ns"])
    except Exception:
        return 2.0


def make_flagship_sample(regime: str, n_links=2048, n_paths=16384,
                         path_len=16, seed=0):
    """Flagship-scale single-graph GraphSample in the requested regime."""
    from ignnition_tpu.data.dataset import AdjacencyArrays, GraphSample

    rng = np.random.default_rng(seed)
    if regime == "local_recovered":
        # latent windowed incidence ... with ids SCRAMBLED: the partitioner
        # must recover the structure, nothing is pre-sorted for it
        anchors = np.sort(rng.integers(0, n_links, n_paths))
        offs = rng.integers(-64, 65, (n_paths, path_len))
        links = (anchors[:, None] + offs) % n_links
        links = rng.permutation(n_links)[links]
        links = links[rng.permutation(n_paths)]
    else:
        links = rng.integers(0, n_links, size=(n_paths, path_len))
    src_lp = links.reshape(-1).astype(np.int32)
    dst_lp = np.repeat(np.arange(n_paths, dtype=np.int32), path_len)
    seq_lp = np.tile(np.arange(path_len, dtype=np.int32), n_paths)
    order = np.argsort(src_lp, kind="stable")
    src_pl = dst_lp[order].copy()
    dst_pl = src_lp[order].copy()
    counts = np.bincount(dst_pl, minlength=n_links)
    seq_pl = np.concatenate([np.arange(c, dtype=np.int32) for c in counts])
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


def project(ms_per_step: float,
            regimes=("random", "random_reordered", "local_recovered"),
            shards=(2, 4, 8)) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _flagship
    from ignnition_tpu.data import build_batch
    from ignnition_tpu.data.graph import PaddingConfig
    from ignnition_tpu.parallel.edgeshard import (
        halo_fractions, partition_batch,
    )
    from ignnition_tpu.parallel.locality import locality_order, reorder_sample

    model_ir = _flagship(num_iterations=8, hs=32)
    pad = PaddingConfig(mode="multiple", multiple=256, min_size=256)
    iters = 8
    gather_ns = calibrated_gather_ns()
    out = {"single_chip_ms": ms_per_step, "ici_gbps_per_link": ICI_GBPS,
           "ici_links": ICI_LINKS, "collective_lat_us": COLLECTIVE_LAT_US,
           "gather_ns_per_row": gather_ns, "regimes": {}}
    for regime in regimes:
        sample = make_flagship_sample(regime)
        arrays0, meta0 = build_batch([sample], model_ir, pad)
        node_pad = {e.name: meta0.nodes(e.name) for e in model_ir.entities}
        rows = {}
        for m in shards:
            if regime == "random":
                arrays, meta = arrays0, meta0
            else:
                orders = locality_order(
                    sample, model_ir, n_model=m, node_pad=node_pad
                )
                re_s, _ = reorder_sample(sample, model_ir, orders=orders)
                arrays, meta = build_batch([re_s], model_ir, pad)
            stacked, local_meta = partition_batch(arrays, meta, model_ir, m)
            # per-shard halo send bytes per iteration: sum over adjacencies
            # of n_model * H * D * 2 (bf16 rows move at message width)
            halo_bytes_iter = 0.0
            n_colls_iter = 0
            for a in model_ir.adjacency_info():
                key = f"halo_send_{a.name}"
                if key in stacked:
                    h = stacked[key].shape[-1]
                    d = model_ir.state_dims()[a.src]
                    halo_bytes_iter += m * h * d * 2
                    n_colls_iter += 1
            bw = ICI_GBPS * 1e9 * ICI_LINKS
            t_comm_iter = halo_bytes_iter / bw + n_colls_iter * (
                COLLECTIVE_LAT_US * 1e-6
            )
            # overlap credit: interior-edge source gather runs during the
            # collective (per-shard edges/m rows at the CALIBRATED ns/row)
            fr = halo_fractions(stacked, model_ir)
            interior_rows = sum(r["interior_edges"] for r in fr.values()) / m
            hidden = min(t_comm_iter, interior_rows * gather_ns * 1e-9)
            t_comm = (t_comm_iter - hidden) * iters
            t_comp = ms_per_step * 1e-3 / m
            eff = t_comp / (t_comp + max(t_comm, 0.0))
            rows[m] = {
                "halo_mb_per_step": round(halo_bytes_iter * iters / 1e6, 2),
                "boundary_frac": round(
                    float(np.mean([r["boundary_frac"]
                                   for r in fr.values()])), 3),
                "t_comm_ms": round(t_comm * 1e3, 3),
                "t_comp_ms": round(t_comp * 1e3, 3),
                "efficiency_pct": round(100 * eff, 1),
                "meets_80pct_target": bool(eff >= 0.80),
            }
        out["regimes"][regime] = rows
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ms-per-step", type=float, default=None,
                   help="measured single-chip flagship step (default: "
                        "BENCH_DETAIL.json)")
    args = p.parse_args()
    ms = args.ms_per_step
    if ms is None:
        ms = _bench_detail()["flagship"]["ms_per_step"]
    print(json.dumps(project(ms), indent=1))


if __name__ == "__main__":
    main()
