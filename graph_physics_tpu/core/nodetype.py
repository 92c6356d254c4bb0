"""Node taxonomy shared by datasets, models and losses.

Mirrors the reference taxonomy (graphphysics/utils/nodetype.py:4-15): the
integer codes are part of the dataset contract (node-type channel in ``x``)
and of the one-hot appended to model inputs, so they must match exactly.
"""

import enum


class NodeType(enum.IntEnum):
    NORMAL = 0
    OBSTACLE = 1
    AIRFOIL = 2
    HANDLE = 3
    INFLOW = 4
    OUTFLOW = 5
    WALL_BOUNDARY = 6
    SIZE = 9


#: Node type used to mark global-attention anchor nodes.
GLOBAL_ATTENTION_NODE = NodeType.WALL_BOUNDARY
