"""The `debug` verb: inspectable artifacts of the compiled model.

The reference's debug() writes a TensorBoard graph whose tf.name_scope
hierarchy (hidden_states / message_passing/iteration_j/<src>s_to_<dst>s/
message|aggregation|update / readout_predictions) is the documented way to
inspect a model (readme.md:109-116, generate_model.py:396-658). The XLA
analog produced here:

  * `structure.txt` — the same hierarchy as a readable tree derived from the
    IR (entities, stages, message passings, aggregations, updates, readout);
  * `params.txt`   — every parameter path with shape and size;
  * `model.hlo.txt` — the lowered stablehlo of one forward step on a small
    batch from the training set (what XLA actually compiles);
  * `model.dot` / `model.svg` and a TensorBoard GRAPH event — the browsable
    visual graph (debuggraph.py), scope-for-scope matching the reference's
    name_scope hierarchy.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def structure_report(model_ir) -> str:
    lines = []
    add = lines.append
    add("model")
    add("├─ hidden_states")
    for e in model_ir.entities:
        feats = ", ".join(f"{f.name}[{f.size}]" for f in e.features) or "(none)"
        add(f"│  ├─ {e.name}: dim={e.state_dim} features: {feats}")
    add(f"├─ message_passing ({model_ir.num_iterations} iterations)")
    for stage in model_ir.stages:
        add(f"│  ├─ stage '{stage.name}'")
        for mp in stage.passes:
            add(f"│  │  ├─ -> {mp.destination}")
            for src in mp.sources:
                ops = " -> ".join(
                    (o.mlp.name if o.kind == "mlp" else "direct") for o in src.ops
                )
                extra = f", edge_params[{src.edge_param_dim}]" if src.edge_param_dim else ""
                add(f"│  │  │  ├─ from {src.entity} via '{src.adj_name}'{extra}: {ops}")
            agg = mp.aggregation
            detail = ""
            if agg.kind == "concat":
                detail = f"(axis={agg.concat_axis})"
            elif agg.kind == "interleave":
                detail = f"(pattern='{agg.interleave_name}')"
            elif agg.kind == "convolution":
                detail = f"(activation={agg.activation})"
            add(f"│  │  │  ├─ aggregation: {agg.kind} {detail}".rstrip())
            upd = mp.update
            upd_desc = (
                f"recurrent {upd.rnn.cell_type} '{upd.rnn.name}'"
                if upd.kind == "recurrent"
                else f"feed-forward '{upd.mlp.name}'"
            )
            add(f"│  │  │  └─ update: {upd_desc}")
    add("└─ readout")
    for op in model_ir.readout:
        if op.kind == "predict":
            add(
                f"   └─ predict({', '.join(op.inputs)}) -> label '{op.label}' "
                f"norm={op.label_normalization} nn='{op.mlp.name}'"
            )
        elif op.kind == "neural_network":
            add(f"   ├─ {op.output_name} = nn '{op.mlp.name}'({', '.join(op.inputs)})")
        elif op.kind == "pooling":
            add(f"   ├─ {op.output_name} = pooling[{op.pooling}]({op.inputs[0]})")
        elif op.kind == "product":
            add(
                f"   ├─ {op.output_name} = product[{op.product}]"
                f"({op.inputs[0]}, {op.inputs[1]})"
            )
        elif op.kind == "extend_adjacencies":
            add(
                f"   ├─ {op.output_names[0]}, {op.output_names[1]} = "
                f"extend_adjacencies[{op.adj_name}]({', '.join(op.inputs)})"
            )
    return "\n".join(lines) + "\n"


def params_report(params) -> str:
    lines = []
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        n = int(leaf.size)
        total += n
        lines.append(f"{name:70s} {str(leaf.shape):>18s} {n:>10d}")
    lines.append(f"{'TOTAL':70s} {'':>18s} {total:>10d}")
    return "\n".join(lines) + "\n"


def write_debug_artifacts(model, out_dir: Optional[str] = None, **runner_kw) -> str:
    from .api import Runner
    from .data import SampleSpec, build_batch, iter_samples

    cfg = model.config
    out_dir = out_dir or cfg.debug_dir
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "structure.txt"), "w") as f:
        f.write(structure_report(model.ir))

    runner = Runner(model, **runner_kw)
    params = runner.gnn.init(jax.random.PRNGKey(0))
    with open(os.path.join(out_dir, "params.txt"), "w") as f:
        f.write(params_report(params))

    spec = SampleSpec.from_ir(model.ir, training=False)
    it = iter_samples(cfg.train_dataset, spec)
    sample = next(it)
    arrays, meta = build_batch([sample], model.ir, training=False)
    lowered = jax.jit(lambda p, b: runner.gnn.apply(p, b, meta)).lower(params, arrays)
    with open(os.path.join(out_dir, "model.hlo.txt"), "w") as f:
        f.write(lowered.as_text())

    # visual graph artifacts: model.dot / model.svg / TensorBoard GraphDef
    # event (the reference's browsable-graph debug workflow, f_o.py:262-268)
    from .debuggraph import write_graph_artifacts

    write_graph_artifacts(model.ir, out_dir)

    # TensorBoard-loadable event file (`tensorboard --logdir <debug_dir>`),
    # mirroring the reference's TensorBoard-based debug workflow
    # (readme.md:109-116): the structure tree and parameter inventory as
    # text summaries
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(out_dir)
        writer.add_text(
            "model/structure",
            "```\n" + structure_report(model.ir) + "```",
        )
        writer.add_text(
            "model/parameters",
            "```\n" + params_report(params) + "```",
        )
        writer.close()
    except ImportError:
        pass  # the text artifacts above carry the same content
    return out_dir
