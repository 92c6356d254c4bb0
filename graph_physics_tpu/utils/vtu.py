"""Minimal VTU (VTK XML unstructured grid) writer/reader.

Parity for the reference's meshio-based VTU export (graphphysics/utils/
meshio_mesh.py:13-117: convert_to_meshio_vtu + vtu_to_xdmf). ASCII VTU is
plain XML; this avoids the meshio dependency. Positions are padded to 3D
(:30-37) and x/y fields exported as x{i}/y{i} columns (:58-67) like the
reference.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

_VTK_CELL = {3: 5, 4: 10}  # triangle=5, tetra=10


def write_vtu(
    path: str,
    pos: np.ndarray,
    cells: np.ndarray,
    point_data: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    from lxml import etree

    pos = np.asarray(pos, np.float64)
    if pos.shape[1] < 3:
        pos = np.concatenate(
            [pos, np.zeros((len(pos), 3 - pos.shape[1]))], axis=1
        )
    cells = np.asarray(cells, np.int64)
    nv = cells.shape[1]

    root = etree.Element(
        "VTKFile", type="UnstructuredGrid", version="0.1", byte_order="LittleEndian"
    )
    grid = etree.SubElement(root, "UnstructuredGrid")
    piece = etree.SubElement(
        grid, "Piece", NumberOfPoints=str(len(pos)), NumberOfCells=str(len(cells))
    )

    def data_array(parent, name, arr, ncomp=None):
        arr = np.asarray(arr)
        kw = {"type": "Float64" if arr.dtype.kind == "f" else "Int64", "Name": name,
              "format": "ascii"}
        if ncomp:
            kw["NumberOfComponents"] = str(ncomp)
        el = etree.SubElement(parent, "DataArray", **kw)
        el.text = " ".join(map(repr, arr.ravel().tolist()))
        return el

    pts = etree.SubElement(piece, "Points")
    data_array(pts, "Points", pos, ncomp=3)

    cl = etree.SubElement(piece, "Cells")
    data_array(cl, "connectivity", cells)
    data_array(cl, "offsets", np.arange(1, len(cells) + 1) * nv)
    data_array(cl, "types", np.full(len(cells), _VTK_CELL[nv], np.int64))

    if point_data:
        pd = etree.SubElement(piece, "PointData")
        for name, arr in point_data.items():
            arr = np.asarray(arr, np.float64)
            ncomp = arr.shape[1] if arr.ndim > 1 else None
            data_array(pd, name, arr, ncomp=ncomp)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    etree.ElementTree(root).write(
        path, pretty_print=True, xml_declaration=True, encoding="utf-8"
    )
    return path


def graph_to_vtu(path: str, graph, extra_fields: Optional[Dict] = None) -> str:
    """Padded MeshGraph → VTU, exporting x/y columns as x{i}/y{i}.

    Spec: convert_to_meshio_vtu (meshio_mesh.py:13-69).
    """
    n = int(graph.n_node) if graph.n_node is not None else graph.x.shape[0]
    pos = np.asarray(graph.pos)[:n]
    if graph.faces is None:
        raise ValueError("graph carries no cells")
    c = (
        int(np.sum(np.asarray(graph.face_mask)))
        if graph.face_mask is not None
        else len(graph.faces)
    )
    cells = np.asarray(graph.faces)[:c]
    fields: Dict[str, np.ndarray] = {}
    x = np.asarray(graph.x)[:n]
    for i in range(x.shape[1]):
        fields[f"x{i}"] = x[:, i]
    if graph.y is not None:
        y = np.asarray(graph.y)[:n]
        for i in range(y.shape[1]):
            fields[f"y{i}"] = y[:, i]
    if extra_fields:
        fields.update({k: np.asarray(v)[:n] for k, v in extra_fields.items()})
    return write_vtu(path, pos, cells, fields)


def read_vtu(path: str) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
    from lxml import etree

    tree = etree.parse(path)
    piece = tree.find(".//Piece")

    def parse(el):
        vals = np.fromstring(el.text, sep=" ")
        ncomp = int(el.get("NumberOfComponents", 1))
        return vals.reshape(-1, ncomp) if ncomp > 1 else vals

    pos = parse(piece.find("Points/DataArray"))
    conn = parse(piece.find("Cells/DataArray[@Name='connectivity']")).astype(np.int64)
    offsets = parse(piece.find("Cells/DataArray[@Name='offsets']")).astype(np.int64)
    nv = int(offsets[0])
    cells = conn.reshape(-1, nv)
    point_data = {}
    pd = piece.find("PointData")
    if pd is not None:
        for el in pd.findall("DataArray"):
            point_data[el.get("Name")] = parse(el)
    return pos, cells, point_data


def vtu_to_xdmf(vtu_paths, xdmf_path: str, dt: float = 1.0) -> str:
    """A series of VTU files → one XDMF time series (meshio_mesh.py:72-117)."""
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesWriter

    w = XdmfTimeSeriesWriter(xdmf_path)
    for i, p in enumerate(vtu_paths):
        pos, cells, pd = read_vtu(p)
        w.append(pos, cells, pd, i * dt)
    return w.path
