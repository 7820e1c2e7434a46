"""papers100M PPR-precompute ledger at the 10M-node proxy scale.

Measures the three offline stages the full-scale run is made of —
native forward-push (k=400, eps=1e-5, the papers100M leaderboard
setting), vectorized bin-cache write over all 10M rows, vectorized
cache read-back — and projects the 111M-node / 1.2M-train-target real
workload from the measured rates (the push is a local algorithm: per-
target work depends on eps/k/degree, not graph size; the cache scales
with rows + payload words).

Round-2 baselines this attacks: ~450 targets/s (std::set frontier +
hash-map state) and an hours-long per-row struct.pack cache writer.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadow_gnn_tpu.data.synthetic import make_random_graph  # noqa: E402
from shadow_gnn_tpu.sampling import ppr as ppr_mod  # noqa: E402
from shadow_gnn_tpu.native import ppr_push_native, get_lib  # noqa: E402

N = 10_000_000
K = 400
EPS = 1e-5
ALPHA = 0.85
TARGET_FRAC = 0.011          # papers100M: 1.2M train targets / 111M nodes
PAPERS_NODES = 111_059_956
PAPERS_TARGETS = 1_207_179


def main():
    t0 = time.time()
    indptr, indices = make_random_graph(N, 12.0, seed=0, power_law=True)
    print(f"[graph] {N} nodes, {indices.size} directed edges "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)
    rng = np.random.default_rng(0)
    n_t = int(N * TARGET_FRAC)
    targets = np.sort(rng.choice(N, size=n_t, replace=False)).astype(np.int64)

    # small-sample state-variant comparison (map = round-2 behavior for
    # graphs > 5M nodes; dense = the dirty-tracked rewrite)
    import ctypes
    lib = get_lib()
    sample = targets[:: max(1, n_t // 2000)][:2000]
    variant_rate = {}
    for name, use_dense in (("map_state", 2), ("dense_state", 1)):
        on = np.empty((sample.size, K), np.int32)
        os_ = np.empty((sample.size, K), np.float32)
        t1 = time.time()
        lib.shadow_ppr_push(
            np.ascontiguousarray(indptr, np.int64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)), N,
            np.ascontiguousarray(indices, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)), indices.size,
            sample.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sample.size, K, ctypes.c_float(1 - ALPHA), ctypes.c_float(EPS),
            0, use_dense,
            on.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            os_.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        variant_rate[name] = sample.size / (time.time() - t1)
        print(f"[push/{name}] {variant_rate[name]:.0f} targets/s",
              file=sys.stderr)

    # full proxy precompute (auto state; all cores)
    t1 = time.time()
    tab_n, tab_s = ppr_push_native(indptr, indices, targets, K, 1 - ALPHA,
                                   EPS, as_dense=True)
    t_push = time.time() - t1
    rate = n_t / t_push
    print(f"[push] {n_t} targets in {t_push:.1f}s = {rate:.0f}/s",
          file=sys.stderr)

    d = "/tmp/ppr_scale_bench"
    os.makedirs(d, exist_ok=True)
    fn, fs = f"{d}/neighs.bin", f"{d}/scores.bin"
    t1 = time.time()
    ppr_mod.write_ppr_cache(fn, fs, N, targets, tab_n, tab_s, K, ALPHA, EPS)
    t_write = time.time() - t1
    sz = os.path.getsize(fn) + os.path.getsize(fs)
    print(f"[write] {sz / 1e9:.2f} GB in {t_write:.1f}s", file=sys.stderr)

    t1 = time.time()
    back = ppr_mod.read_ppr_cache(fn, fs, K, ALPHA, EPS)
    assert back is not None
    nv, sv = back
    t_read = time.time() - t1
    # spot-verify rows
    for i in rng.choice(n_t, 20, replace=False):
        t = int(targets[i])
        valid = tab_n[i] >= 0
        np.testing.assert_array_equal(nv[t], tab_n[i][valid])
        np.testing.assert_allclose(sv[t], tab_s[i][valid], rtol=1e-6)
    print(f"[read] parsed + verified in {t_read:.1f}s", file=sys.stderr)

    # ledger: project papers100M from measured rates
    proxy_words = N + n_t * K
    papers_words = PAPERS_NODES + PAPERS_TARGETS * K
    scale_io = papers_words / proxy_words
    push_1host_min = PAPERS_TARGETS / rate / 60
    ledger = {
        "proxy": {"nodes": N, "targets": n_t, "k": K, "eps": EPS,
                  "push_targets_per_s": round(rate, 1),
                  "push_s": round(t_push, 1),
                  "cache_write_s": round(t_write, 1),
                  "cache_read_s": round(t_read, 1),
                  "cache_bytes": sz,
                  "push_rate_map_state": round(variant_rate["map_state"], 1),
                  "push_rate_dense_state": round(
                      variant_rate["dense_state"], 1)},
        "papers100M_projection": {
            "targets": PAPERS_TARGETS,
            "push_min_1host_4core": round(push_1host_min, 1),
            "push_min_4hosts": round(push_1host_min / 4, 1),
            "cache_write_s": round(t_write * scale_io, 1),
            "cache_read_s": round(t_read * scale_io, 1),
        },
    }
    print(json.dumps(ledger))


if __name__ == "__main__":
    main()
