#!/bin/bash
# One-shot TPU acceptance chain for round 5. Run when the tunnel is alive.
# Logs to /tmp/acc_*.log; each step bounded by timeout.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/rtsdm_jax_cache
echo "=== kernel smoke (Mosaic compile + parity gate) ==="
timeout 1800 python tools/kernel_smoke.py --json /root/repo/SMOKE_r05.json > /tmp/acc_smoke.log 2>&1
SMOKE_RC=$?
echo "smoke rc=$SMOKE_RC"
tail -8 /tmp/acc_smoke.log
if [ $SMOKE_RC -ne 0 ]; then
  echo "KERNEL SMOKE FAILED - aborting acceptance (fix kernels first)"
  exit 1
fi
echo "=== bench.py (headline) ==="
timeout 3600 python bench.py > /tmp/acc_bench.log 2>&1
echo "bench rc=$?"
tail -1 /tmp/acc_bench.log | tee /root/repo/BENCH_SELF_r05.json
echo "=== bench_configs.py ==="
timeout 7200 python bench_configs.py > /tmp/acc_configs.log 2>&1
echo "configs rc=$?"
tail -6 /tmp/acc_configs.log
echo "=== quality_ssim ==="
timeout 7200 python tools/quality_ssim.py > /tmp/acc_quality.log 2>&1
echo "quality rc=$?"
tail -8 /tmp/acc_quality.log
echo "=== stencil stats (sparse phase-2 sizing) ==="
timeout 1800 python tools/stencil_stats.py --width 1920 --height 1080 --scene SunTemple@full > /tmp/acc_stencil.log 2>&1
echo "stencil rc=$?"
tail -1 /tmp/acc_stencil.log | tee /root/repo/STENCIL_r05.json
echo "=== maxcount A/B (VERDICT item 5) ==="
timeout 3600 python tools/maxcount_ab.py --width 1920 --height 1080 --scene SunTemple@full > /tmp/acc_maxcount.log 2>&1
echo "maxcount rc=$?"
tail -1 /tmp/acc_maxcount.log | tee /root/repo/MAXCOUNT_r05.json
echo "=== graph_profile config 1 ==="
timeout 3600 python tools/graph_profile.py --config 1 --out BENCH_GRAPH_r05.json > /tmp/acc_gp1.log 2>&1
echo "gp1 rc=$?"
tail -3 /tmp/acc_gp1.log
echo DONE
