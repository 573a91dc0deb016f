"""Minimal, dependency-free PLY reader/writer (binary little-endian + ascii).

Replaces the reference's use of the `plyfile` package
(/root/reference/scene/dataset_readers.py:29,424-460, scene/gaussian_model.py:182-261).
A C++ fast path for large files lives in native/ (see vegs_tpu.scene.native).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import BinaryIO

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_NP_TO_PLY = {
    "int8": "char", "uint8": "uchar", "int16": "short", "uint16": "ushort",
    "int32": "int", "uint32": "uint", "float32": "float", "float64": "double",
}


@dataclass
class PlyElement:
    name: str
    count: int
    data: np.ndarray  # structured array


@dataclass
class PlyData:
    elements: dict[str, PlyElement] = field(default_factory=dict)

    def __getitem__(self, name: str) -> np.ndarray:
        return self.elements[name].data


def read_ply(path_or_file) -> PlyData:
    if hasattr(path_or_file, "read"):
        return _read(path_or_file)
    with open(path_or_file, "rb") as f:
        return _read(f)


def _read(f: BinaryIO) -> PlyData:
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    elements: list[tuple[str, int, list[tuple[str, str]]]] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in header")
        tokens = line.decode("ascii", "replace").strip().split()
        if not tokens or tokens[0] == "comment":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if tokens[1] == "list":
                # List properties (e.g., face indices) — record but only
                # supported for ascii skip / uniform binary lists.
                elements[-1][2].append((tokens[-1], f"LIST:{tokens[2]}:{tokens[3]}"))
            else:
                elements[-1][2].append((tokens[-1], _PLY_TO_NP[tokens[1]]))
        elif tokens[0] == "end_header":
            break

    if fmt not in ("binary_little_endian", "binary_big_endian", "ascii"):
        raise ValueError(f"unsupported format {fmt}")

    data = PlyData()
    for name, count, props in elements:
        has_list = any(t.startswith("LIST:") for _, t in props)
        if has_list:
            # Only faces use lists; skip by reading row-wise (rare path).
            _skip_list_element(f, fmt, count, props)
            continue
        endian = ">" if fmt == "binary_big_endian" else "<"
        dtype = np.dtype([(pname, endian + ptype) for pname, ptype in props])
        if fmt == "ascii":
            rows = []
            for _ in range(count):
                rows.append(tuple(f.readline().split()))
            arr = np.array(rows, dtype=dtype) if rows else np.empty(0, dtype)
        else:
            buf = f.read(dtype.itemsize * count)
            arr = np.frombuffer(buf, dtype=dtype, count=count).copy()
        data.elements[name] = PlyElement(name, count, arr)
    return data


def _skip_list_element(f, fmt, count, props):
    if fmt == "ascii":
        for _ in range(count):
            f.readline()
        return
    endian = "<" if fmt == "binary_little_endian" else ">"
    for _ in range(count):
        for pname, ptype in props:
            if ptype.startswith("LIST:"):
                _, cnt_t, val_t = ptype.split(":")
                cnt = np.frombuffer(
                    f.read(np.dtype(_PLY_TO_NP[cnt_t]).itemsize),
                    dtype=endian + _PLY_TO_NP[cnt_t],
                )[0]
                f.read(int(cnt) * np.dtype(_PLY_TO_NP[val_t]).itemsize)
            else:
                f.read(np.dtype(ptype).itemsize)


def write_ply(path_or_file, vertex: np.ndarray, element_name: str = "vertex",
              comments: tuple[str, ...] = ()) -> None:
    """Write a structured array as a binary_little_endian PLY element."""
    vertex = np.ascontiguousarray(vertex)
    header = io.StringIO()
    header.write("ply\nformat binary_little_endian 1.0\n")
    for c in comments:
        header.write(f"comment {c}\n")
    header.write(f"element {element_name} {len(vertex)}\n")
    for name in vertex.dtype.names:
        base = vertex.dtype[name]
        ply_t = _NP_TO_PLY[base.base.name if base.shape else base.name]
        if base.shape:
            raise ValueError("flatten sub-array fields before writing")
        header.write(f"property {ply_t} {name}\n")
    header.write("end_header\n")

    def _write(f):
        f.write(header.getvalue().encode("ascii"))
        f.write(vertex.astype(vertex.dtype.newbyteorder("<"), copy=False).tobytes())

    if hasattr(path_or_file, "write"):
        _write(path_or_file)
    else:
        with open(path_or_file, "wb") as f:
            _write(f)


def make_vertex_array(columns: dict[str, np.ndarray]) -> np.ndarray:
    """Build a structured array from named 1D columns (order preserved)."""
    n = len(next(iter(columns.values())))
    dtype = np.dtype([(k, np.asarray(v).dtype.str.lstrip("<>=")) for k, v in columns.items()])
    out = np.empty(n, dtype)
    for k, v in columns.items():
        out[k] = np.asarray(v)
    return out
