#!/bin/bash
# warmup_sweep value measurement: first pick_n_hidden call wall, cold
# cache vs AOT-warmed cache (fresh process per phase; per-phase cache dir).
# Scale: p=4096, n=8192, max_n_hidden=8, repeat=4, int8 (a realistic
# medium sweep; the padded program is the library's biggest compile).
set -e
CACHE=/tmp/sweep_cache_$$
export LINEARCOREX_TPU_CACHE_DIR=$CACHE

run_sweep () {
python - <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import linearcorex_tpu as lc

rng = np.random.RandomState(0)
z = rng.normal(size=(8192, 16))
x = np.repeat(z, 256, axis=1) * 0.8 + 0.6 * rng.normal(size=(8192, 4096))
t0 = time.perf_counter()
best, scores = lc.pick_n_hidden(x, repeat=4, max_n_hidden=8, seed=0,
                                matmul_dtype="int8", tol=1e-4,
                                max_iter=500)
print(f"sweep wall: {time.perf_counter()-t0:.1f} s best={best}",
      flush=True)
EOF
}

echo "== phase 1: cold (empty cache)"
rm -rf $CACHE
run_sweep

echo "== phase 2: warmed (fresh process; warmup_sweep ran in its own process first)"
rm -rf $CACHE
python - <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import linearcorex_tpu as lc
t0 = time.perf_counter()
lc.warmup_sweep(8192, 4096, repeat=4, max_n_hidden=8,
                matmul_dtype="int8", tol=1e-4, max_iter=500)
print(f"warmup_sweep wall: {time.perf_counter()-t0:.1f} s", flush=True)
EOF
run_sweep

echo "== phase 3: repeat (same cache, shows the deserialize floor)"
run_sweep
rm -rf $CACHE
