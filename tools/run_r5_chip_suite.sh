#!/bin/bash
# r5 chip measurement suite — the sequence that produced the r5 tables in
# docs/ARCHITECTURE.md. Run with the host otherwise idle; each step is
# timeout-wrapped. ~2.5-3.5 h total (compiles dominate).
set -u
cd "$(dirname "$0")/.."
echo "#### r5 chip suite start $(date -u +%FT%TZ)"

echo "#### 1. headline bench (refresh bench_last.json FIRST)"
timeout 2400 python bench.py

echo "#### 2. HRNet rows: serving+sparse, then max (int8 branch/layer1/HRFPN)"
V=densepose_rcnn_HRFPN_HRNet_w32_s1x
timeout 2400 python tools/bench_variants.py --mode serving --sparse $V
timeout 2400 python tools/bench_variants.py --mode max $V

echo "#### 3. full per-variant sweep: exact"
timeout 9000 python tools/bench_variants.py --mode exact
echo "#### 4. full per-variant sweep: serving + sparse"
timeout 9000 python tools/bench_variants.py --mode serving --sparse

echo "#### 5. single-run colocated video (sparse 8-slot = real-video config)"
timeout 3600 python tools/bench_video.py --colocated --frames 240 \
    --opts TEST.DETECTIONS_PER_IMAGE 8

echo "#### 6. packed-graph profile (op table for the floor analysis)"
timeout 2400 python tools/profile_ops.py 8 --cfg $V --top 60

echo "#### r5 chip suite done $(date -u +%FT%TZ)"
