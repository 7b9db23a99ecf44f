"""KDN raw-dataset reader + migration, exercised on a synthetic fixture laid
out exactly like the real datasets (graph_attr.txt GML + tar.gz archives of
Routing.txt / simulationResults.txt / params.ini)."""

import json
import os
import tarfile
from io import BytesIO

import networkx as nx
import numpy as np
import pytest

from ignnition_tpu.data import kdn


N = 4  # nodes in the fixture topology


def _build_topology():
    g = nx.MultiDiGraph()
    for i in range(N):
        g.add_node(i)
    # ring + one chord, ports numbered per-node
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    port_counter = {i: 0 for i in range(N)}
    for u, v in edges + [(v, u) for u, v in edges]:
        g.add_edge(u, v, port=port_counter[u], bandwidth="10kbps", weight=1)
        port_counter[u] += 1
    return g


def _shortest_port_routing(g):
    """Routing.txt content: for each src, the egress port toward each dst."""
    port_of = {}
    for u in g:
        for v in g[u]:
            port_of[(u, v)] = g[u][v][0]["port"]
    lines = []
    for src in range(N):
        ports = []
        paths = nx.single_source_shortest_path(nx.DiGraph(g), src)
        for dst in range(N):
            if src == dst or dst not in paths:
                ports.append(-1)
            else:
                ports.append(port_of[(src, paths[dst][1])])
        lines.append(",".join(str(p) for p in ports) + ",")
    return "\n".join(lines) + "\n"


def _results_line(rng):
    """10*N*N fields: N*N (AvgBw, PktsGen, PktsDrop) then N*N 7-field perf."""
    traffic = rng.uniform(100, 500, (N, N, 3))
    perf = rng.uniform(0.1, 2.0, (N, N, 7))
    fields = np.concatenate([traffic.reshape(-1), perf.reshape(-1)])
    return ",".join(f"{v:.6f}" for v in fields) + ",\n"


@pytest.fixture(scope="module")
def raw_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdnraw")
    g = _build_topology()
    nx.write_gml(g, os.path.join(root, "graph_attr.txt"))

    rng = np.random.default_rng(0)
    files = {
        "sim/Routing.txt": _shortest_port_routing(g),
        "sim/simulationResults.txt": "".join(_results_line(rng) for _ in range(5)),
        "sim/params.ini": "[DEFAULT]\nsimulationDuration = 100\nlambda = 1200.5\n",
    }
    with tarfile.open(os.path.join(root, "results_fix_9_line.tar.gz"), "w:gz") as tar:
        for name, text in files.items():
            payload = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, BytesIO(payload))
    return str(root)


def test_iter_kdn_samples(raw_dataset):
    samples = list(kdn.iter_kdn_samples(raw_dataset))
    assert len(samples) == 5
    s = samples[0]
    assert s.n_nodes == N
    assert s.simulation_time == 100
    assert s.max_avg_lambda == 1200.5
    # routing paths start at src, end at dst
    for i in range(N):
        for j in range(N):
            if i != j:
                p = s.routing[i, j]
                assert p[0] == i and p[-1] == j
    # traffic converted kbps->bps
    assert s.traffic_bps.min() >= 100 * 1000
    stats = s.global_stats()
    assert stats["packets_per_sec"] > 0


def test_sample_to_graph_json(raw_dataset):
    s = next(iter(kdn.iter_kdn_samples(raw_dataset)))
    data = kdn.sample_to_graph_json(s)
    n_links = sum(1 for v in data["entities"].values() if v == "link")
    n_paths = sum(1 for v in data["entities"].values() if v == "path")
    assert n_links == 10  # 5 undirected edges * 2 directions
    assert n_paths == N * (N - 1)
    assert len(data["link_capacity"]) == n_links
    assert len(data["traffic"]) == n_paths == len(data["delay"]) == len(data["jitter"])
    # every path's link sequence follows its routing hops
    for pname, links in data["adj_links_paths"].items():
        assert all(l in data["entities"] for l in links)
    # adjacency symmetry
    for lname, paths in data["adj_paths_links"].items():
        for p in paths:
            assert lname in data["adj_links_paths"][p]


def test_migrate_and_train_pipeline(raw_dataset, tmp_path):
    import jax

    from ignnition_tpu.data import SampleSpec, build_batch, find_dataset_dimensions, iter_samples
    from ignnition_tpu.frontend import parser
    from ignnition_tpu.model import build
    from helpers import routenet_description

    n_train, n_eval = kdn.migrate(
        raw_dataset, str(tmp_path), samples_per_archive=3, seed=1
    )
    assert n_train + n_eval == 5
    train_dir = os.path.join(tmp_path, "train")
    dims = find_dataset_dimensions(train_dir)
    assert dims["link_capacity"] == 1

    # normalization: raw traffic is ~1e5 bps; use identity-safe scaling
    desc = routenet_description(num_iterations=2, hs=8)
    ir = parser.parse_model_description(desc, dims)
    spec = SampleSpec.from_ir(ir)
    samples = list(iter_samples(train_dir, spec))
    assert len(samples) == n_train
    arrays, meta = build_batch(samples[:2], ir)
    model = build(ir)
    params = model.init(jax.random.PRNGKey(0))
    preds = model.apply(params, arrays, meta)
    assert np.isfinite(np.asarray(preds)).all()


def _flow_line(rng, num_flows=2):
    """10*N*N*F fields: N*N*F (AvgBw, PktsGen, PktsDrop) triples then
    N*N*F 7-field perf, flow-major within each (src, dst) pair."""
    traffic = rng.uniform(10, 100, (N, N, num_flows, 3))
    perf = rng.uniform(0.1, 2.0, (N, N, num_flows, 7))
    fields = np.concatenate([traffic.reshape(-1), perf.reshape(-1)])
    return ",".join(f"{v:.6f}" for v in fields) + ",\n"


@pytest.fixture(scope="module")
def raw_dataset_with_flows(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdnraw_flows")
    g = _build_topology()
    nx.write_gml(g, os.path.join(root, "graph_attr.txt"))
    rng = np.random.default_rng(3)
    lines = [_results_line(rng) for _ in range(3)]
    rng2 = np.random.default_rng(4)
    flow_lines = [_flow_line(rng2) for _ in range(3)]
    files = {
        "sim/Routing.txt": _shortest_port_routing(g),
        "sim/simulationResults.txt": "".join(lines),
        "sim/flowSimulationResults.txt": "".join(flow_lines),
        "sim/params.ini": "[DEFAULT]\nsimulationDuration = 100\nlambda = 1200.5\n",
    }
    with tarfile.open(os.path.join(root, "results_fix_9_line.tar.gz"), "w:gz") as tar:
        # the reference reader takes tar.next() as the directory entry
        # (datanetAPI.py:692) — real archives start with one
        dinfo = tarfile.TarInfo("sim")
        dinfo.type = tarfile.DIRTYPE
        tar.addfile(dinfo)
        for name, text in files.items():
            payload = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, BytesIO(payload))
    return str(root)


def test_flow_level_parsing(raw_dataset_with_flows):
    samples = list(kdn.iter_kdn_samples(raw_dataset_with_flows))
    assert len(samples) == 3
    s = samples[0]
    assert s.num_flows == 2
    t = s.get_srcdst_traffic(0, 1)
    assert len(t["Flows"]) == 2
    f0 = t["Flows"][0]
    assert f0["TimeDist"] == kdn.TimeDist.EXPONENTIAL_T
    assert f0["SizeDist"] == kdn.SizeDist.BINOMIAL_S
    assert f0["TimeDistParams"]["EqLambda"] == f0["AvgBw"]
    p = s.get_srcdst_performance(0, 1)
    assert len(p["Flows"]) == 2
    assert set(p["Flows"][0]) == {"AvgDelay", "p10", "p20", "p50", "p80", "p90",
                                  "Jitter", "PktsDrop"}


def test_flow_accessor_parity_vs_reference(raw_dataset_with_flows):
    """Drive the ACTUAL reference datanetAPI on the same fixture and compare
    the per-flow traffic/performance dicts field by field
    (datanetAPI.py:721-874)."""
    import sys

    sys.path.insert(0, "/root/reference/examples/Routenet")
    try:
        import datanetAPI as ref_api
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference datanetAPI not importable: {e}")

    ref_samples = list(ref_api.DatanetAPI(raw_dataset_with_flows))
    # the reference shuffles archives but there is only one; lines are in order
    ours = list(kdn.iter_kdn_samples(raw_dataset_with_flows))
    assert len(ref_samples) == len(ours)
    for rs, os_ in zip(ref_samples, ours):
        for src, dst in [(0, 1), (1, 3), (2, 0), (3, 2)]:
            rt = rs.get_srcdst_traffic(src, dst)
            ot = os_.get_srcdst_traffic(src, dst)
            assert len(rt["Flows"]) == len(ot["Flows"]) == 2
            for rf, of in zip(rt["Flows"], ot["Flows"]):
                for k in ("AvgBw", "PktsGen", "TotalPktsGen", "ToS"):
                    np.testing.assert_allclose(of[k], rf[k], rtol=1e-9,
                                               err_msg=f"traffic {k}")
                assert int(of["TimeDist"]) == int(rf["TimeDist"])
                assert int(of["SizeDist"]) == int(rf["SizeDist"])
                assert of["TimeDistParams"] == {
                    k: pytest.approx(v) for k, v in rf["TimeDistParams"].items()
                }
                assert of["SizeDistParams"] == rf["SizeDistParams"]
            rp = rs.get_srcdst_performance(src, dst)
            op = os_.get_srcdst_performance(src, dst)
            for rf, of in zip(rp["Flows"], op["Flows"]):
                for k in rf:
                    np.testing.assert_allclose(of[k], rf[k], rtol=1e-9,
                                               err_msg=f"perf {k}")
            # AggInfo parity too
            for k in rt["AggInfo"]:
                np.testing.assert_allclose(ot["AggInfo"][k], rt["AggInfo"][k],
                                           rtol=1e-6)
            for k in rp["AggInfo"]:
                np.testing.assert_allclose(op["AggInfo"][k], rp["AggInfo"][k],
                                           rtol=1e-6)


def test_agg_only_sample_exposes_single_flow(raw_dataset):
    """Without a flow file the aggregate doubles as the single flow — the
    reference's `f = r` fallback (datanetAPI.py:741-744)."""
    s = next(iter(kdn.iter_kdn_samples(raw_dataset)))
    assert s.num_flows == 1
    t = s.get_srcdst_traffic(0, 2)
    assert len(t["Flows"]) == 1
    np.testing.assert_allclose(t["Flows"][0]["AvgBw"], t["AggInfo"]["AvgBw"])
    p = s.get_srcdst_performance(0, 2)
    np.testing.assert_allclose(p["Flows"][0]["AvgDelay"], p["AggInfo"]["AvgDelay"])


def test_matrix_and_property_accessor_parity_vs_reference(raw_dataset_with_flows):
    """Full accessor-for-accessor parity with the ACTUAL reference Sample:
    get_traffic_matrix / get_performance_matrix (every cell dict, diagonal
    included), get_node_properties, get_link_properties
    (datanetAPI.py:152-289)."""
    import sys

    sys.path.insert(0, "/root/reference/examples/Routenet")
    try:
        import datanetAPI as ref_api
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference datanetAPI not importable: {e}")

    rs = next(iter(ref_api.DatanetAPI(raw_dataset_with_flows)))
    os_ = next(iter(kdn.iter_kdn_samples(raw_dataset_with_flows)))

    n = os_.get_network_size()
    assert rs.get_network_size() == n

    rtm, otm = rs.get_traffic_matrix(), os_.get_traffic_matrix()
    rpm, opm = rs.get_performance_matrix(), os_.get_performance_matrix()
    assert otm.shape == (n, n) and opm.shape == (n, n)

    def assert_cell(ref_cell, our_cell, what):
        for k, v in ref_cell["AggInfo"].items():
            np.testing.assert_allclose(
                our_cell["AggInfo"][k], v, rtol=1e-6,
                err_msg=f"{what} AggInfo[{k}]")
        assert len(our_cell["Flows"]) == len(ref_cell["Flows"])
        for rf, of in zip(ref_cell["Flows"], our_cell["Flows"]):
            for k, v in rf.items():
                if isinstance(v, dict):
                    assert of[k] == {kk: pytest.approx(vv)
                                     for kk, vv in v.items()}, f"{what} {k}"
                else:
                    np.testing.assert_allclose(
                        float(of[k]), float(v), rtol=1e-9,
                        err_msg=f"{what} Flows[{k}]")

    for i in range(n):
        for j in range(n):
            assert_cell(rtm[i, j], otm[i, j], f"traffic[{i},{j}]")
            assert_cell(rpm[i, j], opm[i, j], f"performance[{i},{j}]")

    for node in range(n):
        assert os_.get_node_properties(node) == rs.get_node_properties(node)
    assert os_.get_node_properties(n + 5) is None
    assert rs.get_node_properties(n + 5) is None

    for i in range(n):
        for j in range(n):
            ours = os_.get_link_properties(i, j)
            ref = rs.get_link_properties(i, j)
            assert (ours is None) == (ref is None), (i, j)
            if ref is not None:
                assert ours == ref, (i, j)


def test_getstrig_parity_vs_reference():
    """The enum `getStrig` helpers return the same strings as the reference's
    (datanetAPI.py:35-49, 61-72), including the "UNKNOWN" fallback."""
    import sys

    sys.path.insert(0, "/root/reference/examples/Routenet")
    try:
        import datanetAPI as ref_api
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference datanetAPI not importable: {e}")

    for code in range(-1, 8):
        assert kdn.TimeDist.getStrig(code) == ref_api.TimeDist.getStrig(code)
        assert kdn.SizeDist.getStrig(code) == ref_api.SizeDist.getStrig(code)
    # enum members themselves work as arguments too
    assert kdn.TimeDist.getStrig(kdn.TimeDist.ONOFF_T) == "ONOFF_T"
    assert kdn.SizeDist.getStrig(kdn.SizeDist.GENERIC_S) == "GENERIC_S"
