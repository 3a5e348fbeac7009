#!/bin/bash
# r5 chip measurement suite — run AFTER the HRNet A/B, with the host idle.
# Sequential, each step timeout-wrapped; logs to /tmp/r5_suite.log section
# markers. Order: cheapest-per-information first.
set -u
cd /root/repo
echo "#### r5 chip suite start $(date -u +%FT%TZ)"

echo "#### 1. HRNet max-mode row (int8 branch/layer1/HRFPN chains)"
timeout 2400 python tools/bench_variants.py --mode max densepose_rcnn_HRFPN_HRNet_w32_s1x

echo "#### 2. HRNet packed exact profile (where do the 44.9 ms go)"
timeout 2400 python tools/profile_ops.py 8 --cfg densepose_rcnn_HRFPN_HRNet_w32_s1x --top 60

echo "#### 3. full per-variant sweep: exact"
timeout 7200 python tools/bench_variants.py --mode exact
echo "#### 4. full per-variant sweep: serving + sparse"
timeout 7200 python tools/bench_variants.py --mode serving --sparse

echo "#### 5. colocated video measurement (serving, 720p)"
timeout 3600 python tools/bench_video.py --colocated --frames 240

echo "#### r5 chip suite done $(date -u +%FT%TZ)"
