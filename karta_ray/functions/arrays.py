"""Zero-copy decode of Arrow list columns into numpy matrices.

``.to_pylist()`` on an embedding column costs a Python-object round trip
per value; Arrow list arrays already store their values as one flat
contiguous buffer, so a batch decodes with a single (optional) cast and
a reshape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) ndarray from a ``list<T>`` / ``fixed_size_list<T, d>``
    column whose rows all have the same length. Single flat-buffer view
    + one cast — no per-value Python objects."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.slice(arr.offset * d, n * d)
        out = np.asarray(flat)
    else:
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        widths = np.diff(offsets)
        d = int(widths[0]) if len(widths) else 0
        if len(widths) and not (widths == d).all():
            raise ValueError("ragged list column cannot form a matrix")
        flat = arr.values.slice(int(offsets[0]), n * d)
        out = np.asarray(flat)
    return out.astype(dtype, copy=False).reshape(n, d)


def matrix_to_list_column(mat: np.ndarray, value_type=pa.float64()):
    """Inverse: (n, d) ndarray -> FixedSizeListArray without tolist()."""
    mat = np.ascontiguousarray(mat)
    values = pa.array(mat.ravel(), type=value_type)
    return pa.FixedSizeListArray.from_arrays(values, mat.shape[1])


def matrix_to_binary_column(mat: np.ndarray):
    """(n, d) ndarray -> variable binary column of d*itemsize-byte rows.

    Arrow's hash join rejects nested (list) payload columns; a binary
    blob carries the same bytes and joins fine."""
    mat = np.ascontiguousarray(mat)
    n, d = mat.shape
    width = d * mat.itemsize
    values = pa.py_buffer(mat.tobytes())
    offsets = pa.array(np.arange(0, (n + 1) * width, width,
                                 dtype=np.int32), pa.int32())
    return pa.BinaryArray.from_buffers(pa.binary(), n,
                                       [None, offsets.buffers()[1], values])


def binary_column_to_matrix(col, dtype, d: int) -> np.ndarray:
    """Inverse of :func:`matrix_to_binary_column`: uniform-width binary
    column -> (n, d) ndarray via one buffer view (no per-row bytes)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, d), dtype=dtype)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    width = int(offsets[1] - offsets[0])
    if not (np.diff(offsets) == width).all():
        raise ValueError("ragged binary column cannot form a matrix")
    flat = data[offsets[0]:offsets[-1]]
    return flat.view(dtype).reshape(n, d)


def nested_vertices_to_arrays(col) -> list:
    """list<fixed_size_list<double, 2>> column -> list of (n_i, 2)
    float64 views over one flat decode (per-geometry vertex arrays)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return []
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    inner = arr.flatten()  # fixed_size_list(2) / list(2) of float64
    if pa.types.is_fixed_size_list(inner.type):
        flat = np.asarray(inner.values.slice(inner.offset * 2,
                                             len(inner) * 2))
    else:
        flat = np.asarray(inner.flatten())
    flat = flat.astype(np.float64, copy=False).reshape(-1, 2)
    rel = offsets - offsets[0]
    return [flat[rel[i]:rel[i + 1]] for i in range(len(arr))]
