"""Worker for the 2-process jax.distributed smoke test (test_distributed.py).

Each process simulates one host with 2 virtual CPU devices; the
('data','model') pod mesh puts edge partitioning within the "host" and data
parallelism across "hosts". Run: python _dist_worker.py <pid> <nprocs> <port>
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nprocs, pid)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from __graft_entry__ import _batch, _flagship
from ignnition_tpu.model import build
from ignnition_tpu.parallel import distributed, make_parallel_train_step, stack_batches
from ignnition_tpu.training import build_optimizer, get_loss


def main():
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 2 * nprocs

    model_ir = _flagship(num_iterations=2, hs=8)
    model = build(model_ir)
    params = model.init(jax.random.PRNGKey(0))  # same seed -> replicated
    optimizer = build_optimizer(model_ir.learning.optimizer)
    opt_state = optimizer.init(params)
    loss_fn = get_loss(model_ir.learning.loss)

    # each "host" feeds its own distinct batch (fixed padding -> same meta)
    local = [_batch(model_ir, n_links=12, n_paths=8, max_path_len=4, seed=pid)]
    stacked, meta = stack_batches(local, model_ir)

    mesh = distributed.make_pod_mesh(model_axis_per_host=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": nprocs,
        "model": 2,
    }
    step = make_parallel_train_step(model, optimizer, loss_fn, meta, mesh)
    for i in range(2):
        params, opt_state, loss = step(params, opt_state, stacked)
    print(f"DIST_OK pid={pid} loss={float(loss):.6f}", flush=True)

    # full documented launch: Trainer.train over the pod mesh, each host
    # streaming its own (distinctly shuffled) local data shard
    from ignnition_tpu.data.graph import PaddingConfig
    from ignnition_tpu.data.synthetic import write_dataset
    from ignnition_tpu.training.trainer import Trainer

    d = f"/tmp/ignnition_dist_ds_{port}_{pid}"
    if not os.path.isdir(d):
        write_dataset(d, 1, 4, seed=5, n_links=12, n_paths=8, max_path_len=4)
    trainer = Trainer(
        model, padding=PaddingConfig(mode="multiple", multiple=64, min_size=64)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.train(state, d, max_steps=2, batch_size=2, mesh=mesh, log_every=0)
    assert state.step == 2
    print(f"DIST_TRAIN_OK pid={pid}", flush=True)

    # v2 destination sharding over the pod mesh: the model axis (halo
    # all_to_all) stays within each host's local devices, the data axis
    # crosses processes through the replicated-cotangent gradient psum +
    # the multi-host array assembly in make_edgeshard_train_step
    from ignnition_tpu.parallel import make_edgeshard_train_step, partition_batch
    from ignnition_tpu.parallel.edgeshard import partition_dims

    batches = {
        s: _batch(model_ir, n_links=12, n_paths=8, max_path_len=4, seed=s)
        for s in range(nprocs)
    }
    # every host partitions every (deterministic) seed to agree on pad_to
    pad_to = {"halo": {}, "edges": {}}
    for s, (arrays, meta) in sorted(batches.items()):
        dims = partition_dims(partition_batch(arrays, meta, model_ir, 2)[0])
        for group in ("halo", "edges"):
            for adj, v in dims[group].items():
                pad_to[group][adj] = max(pad_to[group].get(adj, 0), v)
    arrays, meta = batches[pid]  # each host trains on ITS OWN data shard
    stacked, local_meta = partition_batch(
        arrays, meta, model_ir, 2, pad_to=pad_to
    )
    step = make_edgeshard_train_step(
        model, optimizer, loss_fn, local_meta, mesh
    )
    params2 = model.init(jax.random.PRNGKey(0))
    opt_state2 = optimizer.init(params2)
    loss2 = None
    for _ in range(2):
        params2, opt_state2, loss2 = step(
            params2, opt_state2, {k: v[None] for k, v in stacked.items()}
        )
    print(f"DIST_V2_OK pid={pid} loss={float(loss2):.6f}", flush=True)


if __name__ == "__main__":
    main()
