"""Label taxonomies: NYU40 / Eigen13 / RIO27 / ScanNet20.

Equivalent of /root/reference/utils/util_label.py and label_mapping.py. The
class-name lists and the NYU40 palette are the standard public taxonomy
constants (ScanNet benchmark NYU40 ids + the tab20-derived palette used across
ScanNet/3RScan tooling); file-driven mappings read the dataset's own vocab files
so nothing is hardcoded to an install path (the reference hardcodes roots in
utils/define.py:3-10).
"""

from __future__ import annotations

import csv

NYU40_LABEL_NAMES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "blinds", "desk", "shelves",
    "curtain", "dresser", "pillow", "mirror", "floor mat", "clothes",
    "ceiling", "books", "refridgerator", "television", "paper", "towel",
    "shower curtain", "box", "whiteboard", "person", "night stand", "toilet",
    "sink", "lamp", "bathtub", "bag", "otherstructure", "otherfurniture",
    "otherprop",
]

EIGEN13_LABEL_NAMES = [
    "bed", "books", "ceiling", "chair", "floor", "furniture", "objects",
    "picture", "sofa", "table", "tv", "wall", "window",
]

RIO27_LABEL_NAMES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "counter", "shelf", "curtain", "pillow", "clothes", "ceiling",
    "fridge", "tv", "towel", "plant", "box", "nightstand", "toilet", "sink",
    "lamp", "bathtub", "object", "blanket",
]

SCANNET20_LABEL_NAMES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

# ScanNet-standard NYU40 color palette (index 0 = unlabeled/black)
NYU40_COLOR_PALETTE = [
    (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180),
    (255, 187, 120), (188, 189, 34), (140, 86, 75), (255, 152, 150),
    (214, 39, 40), (197, 176, 213), (148, 103, 189), (196, 156, 148),
    (23, 190, 207), (178, 76, 76), (247, 182, 210), (66, 188, 102),
    (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
    (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82),
    (255, 127, 14), (91, 163, 138), (153, 98, 156), (140, 153, 101),
    (158, 218, 229), (100, 125, 154), (178, 127, 135), (120, 185, 128),
    (146, 111, 194), (44, 160, 44), (112, 128, 144), (96, 207, 209),
    (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
    (100, 85, 144),
]


def nyu40_name_to_id(name: str) -> int:
    """1-based NYU40 id (util_label.py:107-131 semantics)."""
    return NYU40_LABEL_NAMES.index(name) + 1


def read_classes(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip().lower() for line in f if line.strip()]


read_relationships = read_classes  # same line format (util_label.py:11-17)


def read_label_mapping(path: str, label_from: str = "Raw Label",
                       label_to: str = "NYU40") -> dict[str, str]:
    """3RScan/ScanNet label-mapping TSV/CSV reader (util_label.py:154-197)."""
    mapping = {}
    with open(path) as f:
        sniff = f.readline()
        f.seek(0)
        delim = "\t" if "\t" in sniff else ","
        for row in csv.DictReader(f, delimiter=delim):
            mapping[row[label_from]] = row[label_to]
    return mapping


def class_2_idx(vocab_path: str) -> dict[str, int]:
    """Class-name -> index from a vocab file (label_mapping.py:3-15)."""
    return {name: i for i, name in enumerate(read_classes(vocab_path))}


rel_2_idx = class_2_idx  # label_mapping.py:17-29
