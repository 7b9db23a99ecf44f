"""Shared test fixtures: model descriptions equivalent to the reference's
RouteNet and Q-size examples, plus small synthetic graphs."""

from __future__ import annotations

import copy


def dense(units, act, reg=0.0, name=None):
    d = {"type_layer": "Dense", "units": units, "activation": act}
    if reg:
        d["kernel_regularizer"] = reg
    if name:
        d["name"] = name
    return d


READOUT_NN = {
    "nn_name": "readout_model",
    "nn_type": "feed_forward",
    "nn_architecture": [
        dense(64, "selu", 0.1),
        dense(1, "None", 0.01),
    ],
}

GRU_NN = {
    "nn_name": "state_update",
    "nn_type": "recurrent_neural_network",
    "recurrent_type": "GRU",
}

LEARNING = {
    "loss": "MeanSquaredError",
    "optimizer": {
        "type": "Adam",
        "schedule": {
            "type": "ExponentialDecay",
            "initial_learning_rate": 0.001,
            "decay_steps": 80000,
            "decay_rate": 0.6,
        },
    },
}


def routenet_description(num_iterations=4, hs=16):
    """Structurally equivalent to reference examples/Routenet/model_description.json:
    link/path entities, ordered link->path (GRU sorted), sum path->link
    (GRU unsorted), predict on path with log label normalization."""
    return {
        "entities": [
            {
                "name": "link",
                "hidden_state_dimension": hs,
                "features": [{"name": "link_capacity"}],
            },
            {
                "name": "path",
                "hidden_state_dimension": hs,
                "features": [{"name": "traffic"}],
            },
        ],
        "message_passing": {
            "num_iterations": num_iterations,
            "stages": [
                {
                    "stage_name": "stage1",
                    "stage_mp": [
                        {
                            "destination_entity": "path",
                            "source_entities": [
                                {
                                    "name": "link",
                                    "adj_vector": "adj_links_paths",
                                    "message": [{"type": "direct_assignation"}],
                                }
                            ],
                            "aggregation": {"type": "ordered"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "state_update",
                            },
                        }
                    ],
                },
                {
                    "stage_name": "stage2",
                    "stage_mp": [
                        {
                            "destination_entity": "link",
                            "source_entities": [
                                {
                                    "name": "path",
                                    "adj_vector": "adj_paths_links",
                                    "message": [{"type": "direct_assignation"}],
                                }
                            ],
                            "aggregation": {"type": "sum"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "state_update",
                            },
                        }
                    ],
                },
            ],
        },
        "readout": [
            {
                "type": "predict",
                "input": ["path"],
                "label": "delay",
                "label_normalization": "log",
                "nn_name": "readout_model",
            }
        ],
        "neural_networks": [copy.deepcopy(READOUT_NN), copy.deepcopy(GRU_NN)],
        "learning_options": copy.deepcopy(LEARNING),
    }


def qsize_description(num_iterations=3, hs=16):
    """Structurally equivalent to reference examples/Q-size: three entities,
    interleave {link,node}->path, sum path->link and path->node."""
    return {
        "entities": [
            {
                "name": "link",
                "hidden_state_dimension": hs,
                "features": [{"name": "link_capacity"}],
            },
            {
                "name": "path",
                "hidden_state_dimension": hs,
                "features": [{"name": "traffic"}],
            },
            {
                "name": "node",
                "hidden_state_dimension": hs,
                "features": [{"name": "queue_sizes"}],
            },
        ],
        "message_passing": {
            "num_iterations": num_iterations,
            "stages": [
                {
                    "stage_name": "step1",
                    "stage_mp": [
                        {
                            "destination_entity": "path",
                            "source_entities": [
                                {
                                    "name": "link",
                                    "adj_vector": "adj_links_paths",
                                    "message": [{"type": "direct_assignation"}],
                                },
                                {
                                    "name": "node",
                                    "adj_vector": "adj_nodes_paths",
                                    "message": [{"type": "direct_assignation"}],
                                },
                            ],
                            "aggregation": {
                                "type": "interleave",
                                "interleave_definition": "path_interleave",
                            },
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "state_update",
                            },
                        }
                    ],
                },
                {
                    "stage_name": "step2",
                    "stage_mp": [
                        {
                            "destination_entity": "link",
                            "source_entities": [
                                {
                                    "name": "path",
                                    "adj_vector": "adj_paths_links",
                                    "message": [{"type": "direct_assignation"}],
                                }
                            ],
                            "aggregation": {"type": "sum"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "state_update",
                            },
                        },
                        {
                            "destination_entity": "node",
                            "source_entities": [
                                {
                                    "name": "path",
                                    "adj_vector": "adj_paths_nodes",
                                    "message": [{"type": "direct_assignation"}],
                                }
                            ],
                            "aggregation": {"type": "sum"},
                            "update": {
                                "type": "recurrent_neural_network",
                                "nn_name": "state_update",
                            },
                        },
                    ],
                },
            ],
        },
        "readout": [
            {
                "type": "predict",
                "input": ["path"],
                "label": "delay",
                "label_normalization": "log",
                "nn_name": "readout_model",
            }
        ],
        "neural_networks": [copy.deepcopy(READOUT_NN), copy.deepcopy(GRU_NN)],
        "learning_options": copy.deepcopy(LEARNING),
    }


TINY_SAMPLE = {
    # 3 links, 2 paths; p0 = [l0, l1], p1 = [l1, l2]
    "entities": {"l0": "link", "l1": "link", "l2": "link", "p0": "path", "p1": "path"},
    "link_capacity": [10.0, 20.0, 30.0],
    "traffic": [1.0, 2.0],
    "delay": [0.5, 0.25],
    "adj_links_paths": {"p0": ["l0", "l1"], "p1": ["l1", "l2"]},
    "adj_paths_links": {"l0": ["p0"], "l1": ["p0", "p1"], "l2": ["p1"]},
}
