"""The debug verb's visual graph artifacts (reference f_o.py:262-268 parity:
a browsable TensorBoard model graph, plus DOT/SVG renderings)."""

from __future__ import annotations

import copy
import glob
import os
import struct
import xml.etree.ElementTree as ET

import pytest

from ignnition_tpu import debuggraph
from ignnition_tpu.frontend import parser

from helpers import routenet_description, qsize_description

DIMS_RN = {"link_capacity": 1, "traffic": 1,
           "adj_links_paths": 0, "adj_paths_links": 0}
DIMS_QS = {"link_capacity": 1, "traffic": 1, "queue_sizes": 1,
           "adj_links_paths": 0, "adj_nodes_paths": 0,
           "adj_paths_links": 0, "adj_paths_nodes": 0}


def _ir(desc, dims):
    return parser.parse_model_description(copy.deepcopy(desc), dict(dims))


def _read_tfrecord_events(path):
    """Minimal TFRecord reader: [len u64][crc u32][payload][crc u32]*."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            (n,) = struct.unpack("<Q", head)
            f.read(4)
            out.append(f.read(n))
            f.read(4)
    return out


def test_graph_nodes_and_edges_routenet():
    nodes, edges = debuggraph.build_graph(_ir(routenet_description(), DIMS_RN))
    assert "hidden_states/link_state" in nodes
    assert "hidden_states/path_state" in nodes
    # both stages produce aggregation/update/state nodes
    assert "message_passing/stage1/path_aggregation" in nodes
    assert "message_passing/stage2/link_aggregation" in nodes
    assert nodes["message_passing/stage1/path_aggregation"].startswith(
        "Aggregation:ordered"
    )
    assert "readout/delay_prediction" in nodes
    # stage2 reads the stage1-UPDATED path state, not the initial one
    # block names carry the adjacency so two sources of one entity never
    # merge (round-4.2 review fix)
    dst2 = ("message_passing/stage2/paths_to_links[adj_paths_links]"
            "/message/direct_assignation_0")
    srcs = [s for s, d in edges if d == dst2]
    assert srcs == ["message_passing/stage1/path_state"]
    # every edge endpoint is a known node
    for s, d in edges:
        assert s in nodes and d in nodes


def test_graph_qsize_interleave():
    nodes, edges = debuggraph.build_graph(_ir(qsize_description(), DIMS_QS))
    agg = [n for n in nodes if nodes[n].startswith("Aggregation:interleave")]
    assert agg, nodes
    # interleave aggregation has BOTH source chains as inputs
    srcs = [s for s, d in edges if d == agg[0]]
    assert len(srcs) == 2


def test_dot_and_svg_render(tmp_path):
    ir = _ir(routenet_description(), DIMS_RN)
    files = debuggraph.write_graph_artifacts(ir, str(tmp_path))
    dot = open(tmp_path / "model.dot").read()
    assert "digraph model" in dot
    assert "hidden_states" in dot and "readout" in dot
    # SVG parses as XML and mentions the model pieces
    tree = ET.parse(tmp_path / "model.svg")
    text = ET.tostring(tree.getroot(), encoding="unicode")
    assert "link_state" in text and "delay_prediction" in text
    assert any(f.endswith("model.svg") for f in files)


def test_tensorboard_graph_event_loads(tmp_path):
    """The event file carries a GraphDef that parses back with every IR node
    present — i.e. `tensorboard --logdir` has a graph to show."""
    pytest.importorskip("tensorboardX")
    from tensorboardX.proto import event_pb2
    from tensorboardX.proto.graph_pb2 import GraphDef

    ir = _ir(routenet_description(), DIMS_RN)
    nodes, edges = debuggraph.build_graph(ir)
    assert debuggraph.write_tensorboard_graph(str(tmp_path), nodes, edges)
    event_files = glob.glob(os.path.join(str(tmp_path), "events.out.*"))
    assert event_files
    graph_defs = []
    for ef in event_files:
        for payload in _read_tfrecord_events(ef):
            ev = event_pb2.Event.FromString(payload)
            if ev.HasField("graph_def"):
                graph_defs.append(GraphDef.FromString(ev.graph_def))
    assert graph_defs, "no graph_def event written"
    names = {n.name for n in graph_defs[0].node}
    assert names == set(nodes)
    by_name = {n.name: n for n in graph_defs[0].node}
    for s, d in edges:
        assert s in by_name[d].input


def test_same_entity_two_adjacencies_get_distinct_chains():
    """Review regression: two sources of the SAME entity in one message
    passing (two adjacencies) used to share a node-name root, silently
    merging their chains in every debug artifact."""
    import copy

    from helpers import routenet_description

    desc = routenet_description(num_iterations=1, hs=8)
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["source_entities"].append(dict(
        copy.deepcopy(mp["source_entities"][0]), adj_vector="adj_links_paths2"
    ))
    ir = parser.parse_model_description(
        copy.deepcopy(desc),
        {"link_capacity": 1, "traffic": 1,
         "adj_links_paths": 0, "adj_links_paths2": 0},
    )
    from ignnition_tpu.debuggraph import build_graph

    nodes, edges = build_graph(ir)
    chains = [n for n in nodes if "/message/direct_assignation_0" in n
              and "stage1" in n]
    assert len(chains) == 2, chains
