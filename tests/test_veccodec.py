"""Zero-copy vector codec: parity with the per-row reference paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from clonehunter_ray.functions import veccodec as V


def _rand(n=37, dim=16, seed=3):
    return np.random.RandomState(seed).normal(size=(n, dim))


def test_list_matrix_float32_roundtrip():
    mat = _rand().astype(np.float32)
    col = pa.array([row.tolist() for row in mat], pa.list_(pa.float32()))
    got = V.list_matrix(col, np.float64)
    np.testing.assert_array_equal(got, mat.astype(np.float64))


def test_list_matrix_zero_copy_float64():
    mat = _rand()
    col = pa.array([row.tolist() for row in mat], pa.list_(pa.float64()))
    got = V.list_matrix(col, np.float64)
    np.testing.assert_array_equal(got, mat)


def test_list_matrix_chunked_and_sliced():
    mat = _rand(40, 8)
    a = pa.array([r.tolist() for r in mat[:25]], pa.list_(pa.float64()))
    b = pa.array([r.tolist() for r in mat[25:]], pa.list_(pa.float64()))
    chunked = pa.chunked_array([a, b])
    np.testing.assert_array_equal(V.list_matrix(chunked), mat)
    sliced = a.slice(3, 10)
    np.testing.assert_array_equal(V.list_matrix(sliced), mat[3:13])


def test_list_matrix_fixed_size_list():
    mat = _rand(10, 4)
    col = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1)), 4
    )
    np.testing.assert_array_equal(V.list_matrix(col), mat)


def test_list_matrix_rejects_ragged_and_null():
    with pytest.raises(ValueError, match="ragged"):
        V.list_matrix(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="null"):
        V.list_matrix(pa.array([[1.0], None], pa.list_(pa.float64())))


def test_blob_roundtrip():
    mat = _rand(23, 12)
    arr = V.matrix_blob_array(mat)
    # byte-parity with the per-row encoding it replaces
    assert arr.to_pylist() == [r.tobytes() for r in mat]
    got = V.blob_matrix(arr)
    np.testing.assert_array_equal(got, mat)


def test_blob_matrix_sliced_and_chunked():
    mat = _rand(30, 6)
    arr = V.matrix_blob_array(mat)
    np.testing.assert_array_equal(V.blob_matrix(arr.slice(7, 11)), mat[7:18])
    chunked = pa.chunked_array([arr.slice(0, 10), arr.slice(10, 20)])
    np.testing.assert_array_equal(V.blob_matrix(chunked), mat)


def test_blob_matrix_accepts_plain_python_encoding():
    mat = _rand(9, 5)
    arr = pa.array([r.tobytes() for r in mat], pa.binary())
    np.testing.assert_array_equal(V.blob_matrix(arr), mat)


def test_blob_matrix_rejects_unequal_widths():
    arr = pa.array([b"12345678", b"1234567812345678"], pa.binary())
    with pytest.raises(ValueError, match="unequal"):
        V.blob_matrix(arr)


def test_matrix_list_array_parity():
    mat = _rand(11, 7)
    arr = V.matrix_list_array(mat, pa.float64())
    ref = pa.array([r.tolist() for r in mat], pa.list_(pa.float64()))
    assert arr.equals(ref)


def test_matrix_list_array_empty():
    arr = V.matrix_list_array(np.empty((0, 0)), pa.float64())
    assert len(arr) == 0


def test_normalized_matrix_parity():
    mat = _rand(19, 8).astype(np.float32)
    mat[3] = 0.0  # zero vector must not divide by zero
    batch = pa.table(
        {
            "vec_id": pa.array(np.arange(19), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in mat], pa.list_(pa.float32())
            ),
        }
    )
    ids, matn = V.normalized_matrix(batch)
    np.testing.assert_array_equal(ids, np.arange(19))
    ref = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
    norms = np.linalg.norm(ref, axis=1, keepdims=True)
    norms[norms < 1e-12] = 1.0
    np.testing.assert_array_equal(matn, ref / norms)


def test_blob_and_list_builders_large_offset_fallback(monkeypatch):
    """Past the int32 offset capacity the builders must switch to
    large_binary / large_list (int64 offsets) instead of silently
    wrapping; decoders accept both. Threshold shrunk so the test
    exercises the fallback without 2 GiB of payload."""
    import numpy as np
    import pyarrow as pa

    from clonehunter_ray.functions import veccodec as V

    monkeypatch.setattr(V, "_INT32_MAX", 64)
    mat = np.arange(24, dtype=np.float64).reshape(4, 6)  # 192 bytes > 64

    blob = V.matrix_blob_array(mat)
    assert pa.types.is_large_binary(blob.type)
    assert (V.blob_matrix(blob, np.float64) == mat).all()

    # list offsets count ELEMENTS (n*dim = 24), not bytes
    monkeypatch.setattr(V, "_INT32_MAX", 16)
    lst = V.matrix_list_array(mat, pa.float64())
    assert pa.types.is_large_list(lst.type)
    assert (V.list_matrix(lst, np.float64) == mat).all()

    # under the threshold the narrow types stay
    monkeypatch.setattr(V, "_INT32_MAX", 10**9)
    assert pa.types.is_binary(V.matrix_blob_array(mat).type)
    assert pa.types.is_list(V.matrix_list_array(mat, pa.float64()).type)
