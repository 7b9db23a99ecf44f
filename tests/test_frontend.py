import pytest

from ignnition_tpu.frontend import parser
from ignnition_tpu.frontend.schema import ModelDescriptionError

from helpers import routenet_description, qsize_description


def test_parse_routenet():
    ir = parser.parse_model_description(
        routenet_description(), dimensions={"link_capacity": 1, "traffic": 1}
    )
    assert ir.entity_names == ("link", "path")
    assert ir.num_iterations == 4
    assert len(ir.stages) == 2
    mp1 = ir.stages[0].passes[0]
    assert mp1.destination == "path"
    assert mp1.aggregation.kind == "ordered"
    assert mp1.update.kind == "recurrent"
    assert mp1.update.rnn.cell_type == "GRU"
    info = ir.adjacency_info()
    assert [(a.name, a.src, a.dst) for a in info] == [
        ("adj_links_paths", "link", "path"),
        ("adj_paths_links", "path", "link"),
    ]
    label, norm, denorm = ir.output_info()
    assert label == "delay" and norm == "log" and denorm is None
    assert ir.learning.loss == "MeanSquaredError"
    assert ir.learning.optimizer.kind == "Adam"
    assert ir.learning.optimizer.schedule.kind == "ExponentialDecay"


def test_parse_qsize_interleave():
    ir = parser.parse_model_description(qsize_description())
    assert ir.interleave_specs() == (("path_interleave", "path"),)
    assert set(ir.interleave_sources()) == {("link", "path"), ("node", "path")}


def test_unknown_entity_rejected():
    d = routenet_description()
    d["message_passing"]["stages"][0]["stage_mp"][0]["destination_entity"] = "nope"
    with pytest.raises(ModelDescriptionError, match="nope"):
        parser.parse_model_description(d)


def test_unknown_nn_rejected():
    d = routenet_description()
    d["message_passing"]["stages"][0]["stage_mp"][0]["update"]["nn_name"] = "ghost"
    with pytest.raises(ModelDescriptionError, match="ghost"):
        parser.parse_model_description(d)


def test_schema_rejects_bad_aggregation():
    d = routenet_description()
    d["message_passing"]["stages"][0]["stage_mp"][0]["aggregation"]["type"] = "median"
    with pytest.raises(ModelDescriptionError):
        parser.parse_model_description(d)


def test_message_input_must_be_produced():
    d = routenet_description()
    d["neural_networks"].append(
        {
            "nn_name": "msg_nn",
            "nn_type": "feed_forward",
            "nn_architecture": [{"type_layer": "Dense", "units": 8}],
        }
    )
    d["message_passing"]["stages"][0]["stage_mp"][0]["source_entities"][0][
        "message"
    ] = [{"type": "neural_network", "nn_name": "msg_nn", "input": ["undefined_thing"]}]
    with pytest.raises(ModelDescriptionError, match="undefined_thing"):
        parser.parse_model_description(d)


def test_exactly_one_predict():
    d = routenet_description()
    d["readout"].append(dict(d["readout"][0]))
    with pytest.raises(ModelDescriptionError, match="predict"):
        parser.parse_model_description(d)


def test_additional_inputs_empty_for_routenet():
    ir = parser.parse_model_description(routenet_description())
    assert ir.additional_inputs() == ()


def test_direct_assignation_output_name_is_friendly_error():
    """Review regression: an output_name on a direct_assignation op used to
    pass validation (registered as produced) and crash in the builder with
    a raw KeyError when consumed; the reference runtime never executes it
    either (g_m.py:440-475 runs only feed_forward ops)."""
    desc = routenet_description()
    mp = desc["message_passing"]["stages"][0]["stage_mp"][0]
    mp["source_entities"][0]["message"] = [
        {"type": "direct_assignation", "output_name": "m0"},
    ]
    with pytest.raises(
        parser.ModelDescriptionError, match="direct_assignation"
    ):
        parser.parse_model_description(
            desc, {"link_capacity": 1, "traffic": 1}
        )
