"""Single-query latency tier dissection (VERDICT r4 item 6).

Where do the 217 us of the 10k x 128 exact_scan p50 go? Layers:
  L0 raw C call (prepared arrays, prebuilt ctypes args)
  L1 native.exact_scan wrapper (ascontiguousarray, ctypes marshalling)
  L2 ExactIndex._host_search_slots (sidecar lookup + margin calc)
  L3 ExactIndex.search end-to-end (batch_search -> keys_for)
Run on the host CPU (no device); contention with a running TPU build
inflates absolute numbers uniformly — the LAYER DELTAS still hold.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from hnsw_tpu import native
from hnsw_tpu.index.exact import ExactIndex

n, d, k = 10_000, 128, 10
rng = np.random.default_rng(0)
data = rng.standard_normal((n, d)).astype(np.float32)
q = rng.standard_normal((256, d)).astype(np.float32)

ex = ExactIndex(metric="cosine")
ex.batch_add(list(range(n)), data)
assert native.available()
c = ex._host_scan_arrays()
print("scan dtype:", c["rows"].dtype, flush=True)

def p50(f, reps=256):
    lats = []
    f(0)
    for i in range(reps):
        t0 = time.perf_counter()
        f(i % 256)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    return (lats[len(lats) // 2] * 1e3, lats[int(.95 * len(lats))] * 1e3)

# L3: full public search
print("L3 search()            p50/p95 ms:", p50(lambda i: ex.search(q[i], k)), flush=True)
# L2: slots path
print("L2 _host_search_slots  p50/p95 ms:", p50(lambda i: ex._host_search_slots(q[i][None], k)), flush=True)
# L1: wrapper
kk = k + 16
print("L1 native.exact_scan   p50/p95 ms:", p50(lambda i: native.exact_scan(
    c["rows"], q[i][None], k, "cosine", kk=kk, sq_norms=c["sq"],
    scales=c["scales"], row_sums=c["row_sums"], alive=c["alive"],
    rr_rows=c["rr_rows"], rr_sq=c["rr_sq"])), flush=True)

# L0: prebuilt ctypes call
import ctypes
lib = native.get_lib()
f32p = ctypes.POINTER(ctypes.c_float)
i32p = ctypes.POINTER(ctypes.c_int32)
null_f = ctypes.cast(None, f32p)
out_ids = np.empty((1, k), np.int64)
out_d = np.empty((1, k), np.float32)
qc = np.ascontiguousarray(q, np.float32)
args_fixed = (
    c["rows"].ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(2 if c["rows"].dtype == np.int8 else 1 if c["rows"].dtype == np.float16 else 0),
    null_f,
    c["scales"].ctypes.data_as(f32p) if c["scales"] is not None else null_f,
    c["row_sums"].ctypes.data_as(i32p) if c["row_sums"] is not None else ctypes.cast(None, i32p),
    c["alive"].ctypes.data_as(ctypes.c_void_p),
    ctypes.c_int64(n), ctypes.c_int32(d), ctypes.c_int32(0),
    c["rr_rows"].ctypes.data_as(f32p), c["rr_sq"].ctypes.data_as(f32p))
oi = out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
od = out_d.ctypes.data_as(f32p)
def l0(i):
    rc = lib.hnsw_exact_scan(*args_fixed,
                             qc[i:i+1].ctypes.data_as(f32p),
                             ctypes.c_int64(1), ctypes.c_int32(k),
                             ctypes.c_int32(kk), oi, od)
    assert rc == 0
print("L0 raw C call          p50/p95 ms:", p50(l0), flush=True)

# L0 without rerank and with kk=k (scan floor)
def l0_norr(i):
    rc = lib.hnsw_exact_scan(args_fixed[0], args_fixed[1], null_f,
                             args_fixed[3], args_fixed[4], args_fixed[5],
                             ctypes.c_int64(n), ctypes.c_int32(d),
                             ctypes.c_int32(0), null_f, null_f,
                             qc[i:i+1].ctypes.data_as(f32p),
                             ctypes.c_int64(1), ctypes.c_int32(k),
                             ctypes.c_int32(k), oi, od)
    assert rc == 0
print("L0 scan only (no rr)   p50/p95 ms:", p50(l0_norr), flush=True)
