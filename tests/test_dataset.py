import numpy as np
import pytest

from ignnition_tpu.data import dataset as ds
from ignnition_tpu.data import graph as G
from ignnition_tpu.data.synthetic import make_routenet_sample, write_dataset
from ignnition_tpu.frontend import parser

from helpers import TINY_SAMPLE, routenet_description, qsize_description


def _ir():
    return parser.parse_model_description(
        routenet_description(), {"link_capacity": 1, "traffic": 1}
    )


def test_make_indices_contiguous_per_entity():
    counts, idx = ds.make_indices(TINY_SAMPLE["entities"])
    assert counts == {"link": 3, "path": 2}
    assert idx == {"l0": 0, "l1": 1, "l2": 2, "p0": 0, "p1": 1}


def test_convert_sample_edges_ordered_by_destination():
    spec = ds.SampleSpec.from_ir(_ir())
    s = ds.convert_sample(TINY_SAMPLE, spec)
    a = s.adjacencies["adj_links_paths"]
    # destination-ordered: p0's links first (seq 0,1) then p1's
    np.testing.assert_array_equal(a.dst_idx, [0, 0, 1, 1])
    np.testing.assert_array_equal(a.src_idx, [0, 1, 1, 2])
    np.testing.assert_array_equal(a.seq, [0, 1, 0, 1])
    b = s.adjacencies["adj_paths_links"]
    np.testing.assert_array_equal(b.dst_idx, [0, 1, 1, 2])
    np.testing.assert_array_equal(b.src_idx, [0, 0, 1, 1])
    np.testing.assert_array_equal(s.label, [0.5, 0.25])


def test_infer_dimensions():
    dims = ds.infer_dimensions(TINY_SAMPLE)
    assert dims["link_capacity"] == 1
    assert dims["adj_links_paths"] == 0  # no edge params


def test_batch_merging_offsets():
    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)
    s1 = ds.convert_sample(TINY_SAMPLE, spec)
    s2 = ds.convert_sample(TINY_SAMPLE, spec)
    arrays, meta = G.build_batch([s1, s2], ir, G.PaddingConfig(min_size=8))
    # second sample's node indices offset by first sample's counts
    e = arrays["src_adj_links_paths"]
    real = e[: 8]  # 4 edges per sample
    np.testing.assert_array_equal(real[:4], [0, 1, 1, 2])
    np.testing.assert_array_equal(real[4:8], [3, 4, 4, 5])
    d = arrays["dst_adj_links_paths"]
    np.testing.assert_array_equal(d[:8], [0, 0, 1, 1, 2, 2, 3, 3])
    assert arrays["node_mask_link"].sum() == 6
    assert arrays["node_mask_path"].sum() == 4
    np.testing.assert_array_equal(arrays["graph_id_path"][:4], [0, 0, 1, 1])
    # labels aligned with padded path rows, log-normalized
    lm = arrays["label_mask"]
    assert lm.sum() == 4
    np.testing.assert_allclose(
        arrays["label"][:4], np.log([0.5, 0.25, 0.5, 0.25]), rtol=1e-6
    )
    assert meta.nodes("path") >= 4


def test_batch_padding_masks_edges():
    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)
    s = ds.convert_sample(TINY_SAMPLE, spec)
    arrays, meta = G.build_batch([s], ir)
    em = arrays["edge_mask_adj_links_paths"]
    assert em.sum() == 4
    assert len(em) == meta.edges("adj_links_paths")


def test_synthetic_roundtrip(tmp_path):
    write_dataset(str(tmp_path), num_archives=2, samples_per_archive=3, seed=1)
    dims = ds.find_dataset_dimensions(str(tmp_path))
    assert dims["link_capacity"] == 1
    ir = parser.parse_model_description(routenet_description(), dims)
    spec = ds.SampleSpec.from_ir(ir)
    samples = list(ds.iter_samples(str(tmp_path), spec))
    assert len(samples) == 6
    arrays, meta = G.build_batch(samples[:3], ir)
    assert arrays["label_mask"].sum() == sum(s.num_nodes["path"] for s in samples[:3])


def test_qsize_interleave_batch():
    ir = parser.parse_model_description(
        qsize_description(), {"link_capacity": 1, "traffic": 1, "queue_sizes": 1}
    )
    rng = np.random.default_rng(0)
    raw = make_routenet_sample(rng, n_links=10, n_paths=6, with_nodes=True)
    spec = ds.SampleSpec.from_ir(ir)
    s = ds.convert_sample(raw, spec)
    assert ("link", "path") in s.interleave
    assert ("node", "path") in s.interleave
    arrays, meta = G.build_batch([s], ir)
    perm = arrays["interleave_perm_path_s0m0"]
    t_out = meta.ilv_len("path_s0m0")
    assert perm.shape == (1, t_out)
    # a permutation: every input slot appears exactly once
    assert sorted(perm[0].tolist()) == list(range(t_out))


def test_parallel_readers_yield_same_sample_multiset(tmp_path):
    d = str(tmp_path / "ds")
    write_dataset(d, num_archives=3, samples_per_archive=4, seed=5)
    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)

    def key(s):
        return tuple(
            sorted((k, v.shape, round(float(np.sum(v)), 4)) for k, v in s.features.items())
        ) + (round(float(np.sum(s.label)), 4),)

    serial = sorted(key(s) for s in ds.iter_samples(d, spec))
    par = sorted(key(s) for s in ds.iter_samples(d, spec, readers=3))
    assert par == serial
    # shuffle + seed works with readers too (same multiset)
    shuf = sorted(key(s) for s in ds.iter_samples(d, spec, readers=2, shuffle=True, seed=1))
    assert shuf == serial


def test_parallel_readers_missing_dir_raises(tmp_path):
    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)
    with pytest.raises(ds.DatasetError):
        list(ds.iter_samples(str(tmp_path / "nope"), spec, readers=2))


# --------------------------------------------------------------------------
# Round-4.2 review regressions
# --------------------------------------------------------------------------


def test_infer_dimensions_skips_empty_first_destination():
    """Review regression: a leading destination with no sources used to
    infer edge-param width 0 and silently drop every other destination's
    edge parameters."""
    sample = {
        "entities": {"l0": "link", "l1": "link", "p0": "path"},
        "adj": {"p0": [], "l0": [["p0", [0.5, 0.2]]]},
    }
    assert ds.infer_dimensions(sample)["adj"] == 2


def test_edge_params_branch_validates_source_entity():
    """Review regression: the edge-params branch skipped the source-entity
    check, so a wrong-entity source silently wired the wrong node's state
    (per-entity indices alias across entities)."""
    import copy

    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)
    bad = copy.deepcopy(TINY_SAMPLE)
    # rewrite one adjacency into [src, params] form with a wrong-entity src
    dst, srcs = next(iter(bad["adj_links_paths"].items()))
    bad["adj_links_paths"][dst] = [["p0" if s.startswith("l") else s, [1.0]]
                                   for s in srcs]
    with pytest.raises(ds.DatasetError, match="sources of entity"):
        ds.convert_sample(bad, spec)


def test_iter_samples_skips_malformed_archive(tmp_path):
    """Review regression: the documented skip-bad-archive resilience only
    caught DatasetError, but malformed samples raise plain
    ValueError/KeyError (e.g. a feature list of the wrong length) — the
    whole iterator died instead of skipping (reference skips broadly,
    generator_std_to_framework.py:226-230)."""
    import copy
    import json
    import tarfile
    from io import BytesIO

    write_dataset(str(tmp_path), 1, 3, seed=0, n_links=6, n_paths=8)
    bad = copy.deepcopy(TINY_SAMPLE)
    bad["link_capacity"] = bad["link_capacity"][:-1]  # ragged feature
    payload = json.dumps([bad]).encode()
    with tarfile.open(tmp_path / "aaa_bad.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo("data.json")
        info.size = len(payload)
        tar.addfile(info, BytesIO(payload))

    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)
    got = list(ds.iter_samples(str(tmp_path), spec))
    assert len(got) == 3  # the good archive's samples; the bad one skipped


def test_iter_samples_propagates_programming_errors(tmp_path, monkeypatch):
    """Advisor-found (r4): the archive skip-and-log used a blanket
    `except Exception`, so a programming error anywhere in the pipeline
    silently shrank the training set to zero with only a log line. Data
    errors skip (previous test); machinery bugs must propagate."""
    write_dataset(str(tmp_path), 1, 2, seed=0, n_links=6, n_paths=8)
    ir = _ir()
    spec = ds.SampleSpec.from_ir(ir)

    def boom(raw, spec):
        raise AttributeError("machinery bug, not a data problem")

    monkeypatch.setattr(ds, "convert_sample", boom)
    with pytest.raises(AttributeError, match="machinery bug"):
        list(ds.iter_samples(str(tmp_path), spec, use_native="never"))
