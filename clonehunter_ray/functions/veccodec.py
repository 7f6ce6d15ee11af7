"""Zero-copy codecs between Arrow columns and numpy matrices.

Every embedding-family pipeline (kmeans / SemDeDup / prototype-prune /
PQ / exact-cosine) ingests a ``list<float>`` column per corpus pass —
and kmeans by design re-scans the corpus ``iters + 2`` times.  A
``to_pylist()`` there materializes one Python ``list`` of Python
floats PER VECTOR before the vectorized math starts, which round 4
measured as the dominant cost of the d4 pipeline.  These helpers keep
the whole batch in flat Arrow buffers:

* ``list_matrix``       — list<float*> column  -> (n, dim) ndarray
* ``blob_matrix``       — equal-width binary   -> (n, w)  ndarray
* ``matrix_blob_array`` — (n, w) ndarray       -> pa.binary() array
* ``matrix_list_array`` — (n, dim) ndarray     -> pa.list_(t) array
* ``normalized_matrix`` — (ids, row-L2-normalized float64 matrix)

All four array builders construct ONE contiguous values buffer plus a
vectorized offsets vector — no per-row Python objects in either
direction.  ``list_matrix``/``blob_matrix`` validate fixed width (a
ragged column would silently mis-reshape) and fall back to a single
vectorized copy only when the underlying buffer is sliced to a
non-aligned byte offset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# int32 offset capacity; module-level so tests can shrink it to
# exercise the large_binary / large_list fallback without 2 GiB RAM
_INT32_MAX = int(np.iinfo(np.int32).max)


def _combined(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def list_matrix(
    col: "pa.ChunkedArray | pa.Array", dtype=np.float64
) -> np.ndarray:
    """Decode a fixed-width ``list<float*>`` / ``fixed_size_list``
    column to an ``(n, dim)`` ndarray without per-row Python objects.

    The flatten + reshape is zero-copy from the Arrow values buffer;
    the only copy is the (vectorized) dtype cast when the storage type
    differs from ``dtype`` (e.g. float32 parquet -> float64 math).
    Raises on ragged rows or null entries rather than mis-reshaping.
    """
    arr = _combined(col)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("list_matrix: column contains null vectors")
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        values = arr.flatten().to_numpy(zero_copy_only=False)
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not np.all(widths == dim):
            raise ValueError("list_matrix: ragged list column")
        values = arr.flatten().to_numpy(zero_copy_only=False)
    if values.shape[0] != n * dim:
        raise ValueError("list_matrix: values/offsets length mismatch")
    return values.reshape(n, dim).astype(dtype, copy=False)


def blob_matrix(
    col: "pa.ChunkedArray | pa.Array", dtype=np.float64
) -> np.ndarray:
    """Decode an equal-width ``binary`` column (row-major ``dtype``
    payloads, e.g. ``matn[i].tobytes()``) to an ``(n, w)`` ndarray.

    Views the Arrow data buffer directly; copies only if the slice
    start is not aligned for ``dtype`` (possible on odd array slices).
    """
    arr = _combined(col)
    n = len(arr)
    item = np.dtype(dtype).itemsize
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("blob_matrix: column contains null blobs")
    if pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    elif pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"blob_matrix: expected binary, got {arr.type}")
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    widths = np.diff(offsets)
    w = int(widths[0])
    if not np.all(widths == w):
        raise ValueError("blob_matrix: unequal blob widths")
    if w % item:
        raise ValueError(f"blob_matrix: width {w} not a multiple of {item}")
    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        int(offsets[0]) : int(offsets[-1])
    ]
    if flat.ctypes.data % item:
        flat = flat.copy()  # re-align (rare: odd slice offset)
    return flat.view(dtype).reshape(n, w // item)


def matrix_blob_array(mat: np.ndarray) -> pa.Array:
    """Encode an ``(n, w)`` matrix as a ``pa.binary()`` array of
    row-major ``mat.dtype`` payloads — ONE contiguous data buffer and
    a vectorized offsets vector, no per-row ``tobytes()``. Payloads
    past the 2 GiB int32-offset limit switch to ``large_binary``
    (int64 offsets) instead of silently wrapping; ``blob_matrix``
    reads both."""
    n = len(mat)
    if n == 0:
        return pa.array([], pa.binary())
    byte_w = mat.shape[1] * mat.dtype.itemsize
    total = n * byte_w
    if total > _INT32_MAX:
        offsets64 = np.arange(n + 1, dtype=np.int64) * np.int64(byte_w)
        return pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [
                None,
                pa.py_buffer(offsets64.tobytes()),
                pa.py_buffer(np.ascontiguousarray(mat).tobytes()),
            ],
        )
    offsets = np.arange(n + 1, dtype=np.int32) * np.int32(byte_w)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [
            None,
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(np.ascontiguousarray(mat).tobytes()),
        ],
    )


def matrix_list_array(mat: np.ndarray, value_type=None) -> pa.Array:
    """Encode an ``(n, dim)`` matrix as ``pa.list_(value_type)`` from
    one flat values array + vectorized offsets (``large_list`` with
    int64 offsets past the int32 element-count limit)."""
    n = len(mat)
    dim = mat.shape[1] if mat.ndim == 2 else 0
    values = pa.array(
        np.ascontiguousarray(mat).reshape(-1),
        value_type if value_type is not None else None,
    )
    if n * dim > _INT32_MAX:
        offsets64 = pa.array(np.arange(n + 1, dtype=np.int64) * np.int64(dim))
        return pa.LargeListArray.from_arrays(offsets64, values)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * np.int32(dim))
    return pa.ListArray.from_arrays(offsets, values)


def normalized_matrix(
    batch: pa.Table, id_col: str = "vec_id", emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """(int64 ids, row-L2-normalized float64 matrix) for one Arrow
    batch — the shared ingest kernel of the embedding family."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_matrix(batch[emb_col], np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms < 1e-12] = 1.0
    return ids, mat / norms
