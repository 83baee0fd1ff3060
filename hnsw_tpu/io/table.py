"""Vector-table codecs: Parquet / Arrow IPC / npz.

Schemas mirror the reference's four-file layout (parquet/storage.go:
127-168; arrow/storage.go:45-85):

  vectors.(parquet|arrow):   (key, vector list<float32>)
  layers.(parquet|arrow):    (layer_id int32, key)
  neighbors.(parquet|arrow): (layer_id int32, key, neighbor_key)
  metadata.(parquet|arrow):  JSON-encoded params blob

Keys serialize as int64 when all keys are ints, else as strings with a
declared key_kind (absorbing the reference's key_utils.go coercion
matrices). pyarrow is available in this image; the npz format is the
dependency-free fallback.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.ipc as pa_ipc
    import pyarrow.parquet as pq
    HAVE_ARROW = True
except Exception:  # pragma: no cover
    HAVE_ARROW = False


def _atomic_write(path: str, write_fn) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def key_to_json(k: Any) -> Any:
    """Tagged, injective, code-exec-safe key encoding.

    Every key type gets an explicit tag so round-trips preserve identity
    exactly (a string key "1" stays a string; tuple keys stay hashable
    tuples). Mirrors the exhaustive-but-safe spirit of the reference's
    key coercion matrix (parquet/key_utils.go:42-235) without sniffing.
    """
    if isinstance(k, bool):
        return ["b", bool(k)]
    if isinstance(k, (int, np.integer)):
        return ["i", int(k)]
    if isinstance(k, (float, np.floating)):
        return ["f", float(k)]
    if isinstance(k, str):
        return ["s", k]
    if isinstance(k, bytes):
        return ["y", k.hex()]
    if isinstance(k, tuple):
        return ["t", [key_to_json(x) for x in k]]
    raise TypeError(
        f"unsupported key type {type(k).__name__}; keys must be "
        f"int/str/float/bool/bytes or tuples thereof")


def key_from_json(j: Any) -> Any:
    tag, payload = j[0], (j[1] if len(j) > 1 else None)
    if tag == "b":
        return bool(payload)
    if tag == "i":
        return int(payload)
    if tag == "f":
        return float(payload)
    if tag == "s":
        return payload
    if tag == "y":
        return bytes.fromhex(payload)
    if tag == "t":
        return tuple(key_from_json(x) for x in payload)
    raise ValueError(f"unknown key tag {tag!r}")


def encode_keys(keys: Sequence[Any]) -> Tuple[list, str]:
    """-> (encoded list, key_kind). int64 fast path when all keys are
    ints (and none are bools); otherwise tagged-JSON strings ("json")."""
    if all(isinstance(k, (int, np.integer)) and not isinstance(k, bool)
           for k in keys):
        return [int(k) for k in keys], "int64"
    return [json.dumps(key_to_json(k)) for k in keys], "json"


def decode_keys(vals: Sequence[Any], kind: str) -> List[Any]:
    if kind == "int64":
        return [int(v) for v in vals]
    if kind == "json":
        return [key_from_json(json.loads(v)) for v in vals]
    # legacy kind "str" (round-1 files): best-effort heuristic decode
    out = []
    for v in vals:
        if isinstance(v, str) and v[:1] in "[{0123456789-\"tfn":
            try:
                decoded = json.loads(v)
                out.append(tuple(decoded) if isinstance(decoded, list)
                           else decoded)
                continue
            except (json.JSONDecodeError, ValueError):
                pass
        out.append(v)
    return out


def write_vectors(path: str, keys: Sequence[Any], vectors: np.ndarray,
                  fmt: str, compression: str = "snappy") -> None:
    """(key, vector) table (parquet/storage.go:127's schema)."""
    vectors = np.asarray(vectors, np.float32)
    enc, kind = encode_keys(keys)
    if fmt == "npz":
        _atomic_write(path, lambda p: np.savez_compressed(
            open(p, "wb"),
            keys=(np.asarray(enc, np.int64) if kind == "int64"
                  else np.asarray(enc, dtype=object).astype("U")),
            vectors=vectors, key_kind=np.str_(kind)))
        return
    if not HAVE_ARROW:  # pragma: no cover
        raise RuntimeError("pyarrow unavailable; use fmt='npz'")
    key_arr = (pa.array(enc, pa.int64()) if kind == "int64"
               else pa.array(enc, pa.string()))
    vec_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vectors.ravel(), pa.float32()), vectors.shape[1]
        if vectors.size else 1)
    table = pa.table({"key": key_arr, "vector": vec_arr})
    table = table.replace_schema_metadata({"key_kind": kind,
                                           "dim": str(vectors.shape[1]
                                                      if vectors.size else 0)})
    if fmt == "parquet":
        _atomic_write(path, lambda p: pq.write_table(
            table, p, compression=compression))
    elif fmt == "arrow":
        def w(p):
            with pa_ipc.new_file(p, table.schema) as f:
                f.write_table(table)
        _atomic_write(path, w)
    else:
        raise ValueError(f"unknown format {fmt}")


def read_vectors(path: str, fmt: str) -> Tuple[List[Any], np.ndarray]:
    if fmt == "npz":
        with np.load(path, allow_pickle=False) as z:
            kind = str(z["key_kind"])
            keys = decode_keys(z["keys"].tolist() if kind == "int64"
                               else [str(x) for x in z["keys"]], kind)
            return keys, z["vectors"]
    if not HAVE_ARROW:  # pragma: no cover
        raise RuntimeError("pyarrow unavailable; use fmt='npz'")
    if fmt == "parquet":
        table = pq.read_table(path)
    elif fmt == "arrow":
        with pa_ipc.open_file(path) as f:
            table = f.read_all()
    else:
        raise ValueError(f"unknown format {fmt}")
    meta = table.schema.metadata or {}
    kind = (meta.get(b"key_kind") or b"int64").decode()
    keys = decode_keys(table.column("key").to_pylist(), kind)
    vec_col = table.column("vector")
    vecs = np.asarray(vec_col.combine_chunks().flatten(),
                      dtype=np.float32)
    n = len(keys)
    dim = int((meta.get(b"dim") or b"0").decode()) or (
        len(vecs) // n if n else 0)
    return keys, vecs.reshape(n, dim) if n else np.zeros((0, 0), np.float32)


def write_edges(path: str, layer_ids: np.ndarray, keys: Sequence[Any],
                neighbor_keys: Sequence[Any], fmt: str,
                compression: str = "snappy") -> None:
    """neighbors table (layer_id, key, neighbor_key)
    (parquet/storage.go:127-168)."""
    # encode jointly so both columns share one key_kind
    both, kind = encode_keys(list(keys) + list(neighbor_keys))
    enc_k, enc_n = both[:len(keys)], both[len(keys):]
    if fmt == "npz":
        _atomic_write(path, lambda p: np.savez_compressed(
            open(p, "wb"), layer_ids=np.asarray(layer_ids, np.int32),
            keys=np.asarray(enc_k), neighbor_keys=np.asarray(enc_n),
            key_kind=np.str_(kind)))
        return
    if not HAVE_ARROW:  # pragma: no cover
        raise RuntimeError("pyarrow unavailable; use fmt='npz'")
    kt = pa.int64() if kind == "int64" else pa.string()
    table = pa.table({
        "layer_id": pa.array(np.asarray(layer_ids, np.int32), pa.int32()),
        "key": pa.array(enc_k, kt),
        "neighbor_key": pa.array(enc_n, kt),
    }).replace_schema_metadata({"key_kind": kind})
    if fmt == "parquet":
        _atomic_write(path, lambda p: pq.write_table(
            table, p, compression=compression))
    else:
        def w(p):
            with pa_ipc.new_file(p, table.schema) as f:
                f.write_table(table)
        _atomic_write(path, w)


def read_edges(path: str, fmt: str
               ) -> Tuple[np.ndarray, List[Any], List[Any]]:
    if fmt == "npz":
        with np.load(path, allow_pickle=False) as z:
            kind = str(z["key_kind"])
            keys = decode_keys(
                z["keys"].tolist() if kind == "int64"
                else [str(x) for x in z["keys"]], kind)
            nbrs = decode_keys(
                z["neighbor_keys"].tolist() if kind == "int64"
                else [str(x) for x in z["neighbor_keys"]], kind)
            return z["layer_ids"], keys, nbrs
    if fmt == "parquet":
        table = pq.read_table(path)
    elif fmt == "arrow":
        with pa_ipc.open_file(path) as f:
            table = f.read_all()
    else:
        raise ValueError(f"unknown format {fmt}")
    meta = table.schema.metadata or {}
    kind = (meta.get(b"key_kind") or b"int64").decode()
    return (np.asarray(table.column("layer_id").to_pylist(), np.int32),
            decode_keys(table.column("key").to_pylist(), kind),
            decode_keys(table.column("neighbor_key").to_pylist(), kind))


def write_metadata(path: str, payload: dict, fmt: str) -> None:
    blob = json.dumps(payload).encode()
    if fmt == "npz":
        _atomic_write(path, lambda p: np.savez_compressed(
            open(p, "wb"), blob=np.frombuffer(blob, np.uint8)))
        return
    table = pa.table({"json": pa.array([blob.decode()], pa.string())})
    if fmt == "parquet":
        _atomic_write(path, lambda p: pq.write_table(table, p))
    else:
        def w(p):
            with pa_ipc.new_file(p, table.schema) as f:
                f.write_table(table)
        _atomic_write(path, w)


def read_metadata(path: str, fmt: str) -> dict:
    if fmt == "npz":
        with np.load(path, allow_pickle=False) as z:
            return json.loads(bytes(z["blob"].tobytes()).decode())
    if fmt == "parquet":
        table = pq.read_table(path)
    else:
        with pa_ipc.open_file(path) as f:
            table = f.read_all()
    return json.loads(table.column("json")[0].as_py())


def ext_for(fmt: str) -> str:
    return {"parquet": "parquet", "arrow": "arrow", "npz": "npz"}[fmt]
