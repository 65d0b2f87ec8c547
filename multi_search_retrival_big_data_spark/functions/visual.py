"""Visual-grid query encoding (SURVEY.md Q20) — the /panel endpoint's
query compiler: drawn boxes → 7×7 grid-cell tokens.

Driver-side pure functions, exactly like the reference compiles panel
queries on the serving thread (utils/parse_frontend.py:3-52,
utils/context_encoding.py:7-131); no cluster work happens here — the
emitted token lists feed the sparse multichannel search
(operators/sparse.multichannel_tfidf_score).

Behavior parity notes (verified against the reference):
- grid cells are labeled "{column letter}{row digit}" ("a0".."g6");
  cell (row i, col j) spans x ∈ [j/7,(j+1)/7], y ∈ [i/7,(i+1)/7];
- a box emits a token for EVERY cell with IoU > 0 (strict positive
  overlap area — touching edges do not count, matching box_iou);
- class names drop spaces ("traffic light" → "trafficlight"), color
  names drop the trailing underscore ("orange_" → "orange" — the
  underscore exists to keep the color distinct from the fruit class);
- class-count tokens enumerate "class0".."class{n-1}" per occurrence;
- amounts split on ',' and drop spaces; tags join as-is.
"""

from __future__ import annotations

from collections.abc import Sequence

# COCO-80 class vocabulary (public; the reference's detector vocabulary)
CLASSES: tuple[str, ...] = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)

COLORS: tuple[str, ...] = (
    "black", "blue", "brown", "green", "grey", "orange_", "pink",
    "purple", "red", "white", "yellow",
)

GRID_ROWS = tuple("0123456")
GRID_COLS = tuple("abcdefg")

Box = tuple[float, float, float, float]  # (x0, y0, x1, y1), normalized


def grid_cells() -> list[tuple[str, Box]]:
    """49 (label, box) cells in row-major order."""
    n_r, n_c = len(GRID_ROWS), len(GRID_COLS)
    cells = []
    for i in range(n_r):
        for j in range(n_c):
            cells.append(
                (
                    GRID_COLS[j] + GRID_ROWS[i],
                    (j / n_c, i / n_r, (j + 1) / n_c, (i + 1) / n_r),
                )
            )
    return cells


def box_iou(a: Box, b: Box) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    if inter <= 0.0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def _cells_overlapping(box: Box) -> list[str]:
    return [label for label, cell in grid_cells() if box_iou(box, cell) > 0.0]


def encode_bboxes(boxes: Sequence[Box], class_names: Sequence[str]) -> list[str]:
    """'{cell}{class}' token per (box, overlapped cell), box-major order."""
    out = []
    for box, cls in zip(boxes, class_names):
        cls_tok = cls.replace(" ", "")
        out += [cell + cls_tok for cell in _cells_overlapping(box)]
    return out


def encode_colors(boxes: Sequence[Box], color_names: Sequence[str]) -> list[str]:
    out = []
    for box, color in zip(boxes, color_names):
        col_tok = color.replace("_", "")
        out += [cell + col_tok for cell in _cells_overlapping(box)]
    return out


def encode_class_counts(class_names: Sequence[str]) -> list[str]:
    """'classN' enumeration tokens: k occurrences of c → c0..c{k-1},
    grouped per class in first-seen order of the sorted unique set."""
    uniq: dict[str, int] = {}
    for c in sorted(set(class_names)):
        uniq[c] = sum(1 for x in class_names if x == c)
    out = []
    for c, count in uniq.items():
        tok = c.replace(" ", "")
        out += [f"{tok}{i}" for i in range(count)]
    return out


def parse_panel(panel: dict) -> dict[str, list[str] | None]:
    """The /panel request body → per-channel token lists
    {bbox, class, color, tag, number} (None = channel unused), the
    shape `multichannel_tfidf_score` consumes after term-counting.

    panel = {"dragObject": [{"type": ..., "position": {"xTop": ...,
    "yTop": ..., "xBottom": ..., "yBottom": ...}}], "tags": [...],
    "amount": "..."}."""
    boxes: list[Box] = []
    classes: list[str] = []
    cboxes: list[Box] = []
    colors: list[str] = []
    for item in panel.get("dragObject", []):
        pos = item["position"]
        box = (pos["xTop"], pos["yTop"], pos["xBottom"], pos["yBottom"])
        if item["type"] in COLORS:
            cboxes.append(box)
            colors.append(item["type"])
        else:
            if item["type"] not in CLASSES:
                raise KeyError(f"unknown panel object type {item['type']!r}")
            boxes.append(box)
            classes.append(item["type"])

    out: dict[str, list[str] | None] = {
        "bbox": encode_bboxes(boxes, classes) or None,
        "class": None,  # parity: the reference never emits class counts
        "color": encode_colors(cboxes, colors) or None,
        "tag": [str(t) for t in panel.get("tags", [])] or None,
    }
    amount = panel.get("amount", "")
    out["number"] = (
        [a.replace(" ", "") for a in amount.split(",")] if amount else None
    )
    if all(v is None for v in out.values()):
        return {}
    return out
