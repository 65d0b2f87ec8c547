from __future__ import annotations

import pytest

from multi_search_retrival_big_data_spark.functions import visual


def test_grid_has_49_cells_with_reference_labels():
    cells = dict(visual.grid_cells())
    assert len(cells) == 49
    assert cells["a0"] == (0.0, 0.0, 1 / 7, 1 / 7)
    # letter = column (x), digit = row (y)
    x0, y0, x1, y1 = cells["g6"]
    assert (round(x0, 6), round(y0, 6)) == (round(6 / 7, 6), round(6 / 7, 6))


def test_box_iou_touching_edges_do_not_overlap():
    a = (0.0, 0.0, 0.5, 0.5)
    b = (0.5, 0.0, 1.0, 0.5)  # shares an edge only
    assert visual.box_iou(a, b) == 0.0
    assert visual.box_iou(a, a) == 1.0


def test_encode_bboxes_emits_cell_class_tokens():
    # box covering exactly the top-left 2x1 cells (strictly inside col a+b, row 0)
    box = (0.01, 0.01, 2 / 7 - 0.01, 1 / 7 - 0.01)
    toks = visual.encode_bboxes([box], ["traffic light"])
    assert toks == ["a0trafficlight", "b0trafficlight"]


def test_encode_colors_strips_underscore():
    box = (0.01, 0.01, 1 / 7 - 0.01, 1 / 7 - 0.01)
    assert visual.encode_colors([box], ["orange_"]) == ["a0orange"]


def test_encode_class_counts_enumerates():
    assert visual.encode_class_counts(["dog", "cat", "dog"]) == [
        "cat0",
        "dog0",
        "dog1",
    ]


def test_parse_panel_full_shape():
    panel = {
        "dragObject": [
            {"type": "person", "position": {"xTop": 0.01, "yTop": 0.01, "xBottom": 0.1, "yBottom": 0.1}},
            {"type": "red", "position": {"xTop": 0.5, "yTop": 0.5, "xBottom": 0.55, "yBottom": 0.55}},
        ],
        "tags": ["street", "night"],
        "amount": "person 2, car 1",
    }
    out = visual.parse_panel(panel)
    assert out["bbox"] == ["a0person"]
    assert out["color"] == ["d3red"]
    assert out["class"] is None  # reference parity: class channel never emitted
    assert out["tag"] == ["street", "night"]
    assert out["number"] == ["person2", "car1"]


def test_parse_panel_empty_returns_empty():
    assert visual.parse_panel({"dragObject": [], "tags": [], "amount": ""}) == {}


def test_parse_panel_unknown_type_raises():
    with pytest.raises(KeyError):
        visual.parse_panel(
            {"dragObject": [{"type": "dragon", "position": {"xTop": 0, "yTop": 0, "xBottom": 1, "yBottom": 1}}]}
        )
