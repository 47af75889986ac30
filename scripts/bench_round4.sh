#!/bin/bash
# Round-4 bench matrix: run serially on the one TPU chip, append JSON+tag
# lines to the output file. Usage: bash scripts/bench_round4.sh [outfile]
OUT=${1:-/tmp/bench_r4.jsonl}
cd "$(dirname "$0")/.."
run() {
  tag=$1; shift
  echo "### $tag [$(date +%H:%M:%S)]" | tee -a "$OUT"
  env "$@" timeout 2400 python bench.py 2>/tmp/bench_err.log \
    | tail -1 | tee -a "$OUT"
  rc=${PIPESTATUS[0]}    # python/timeout status, not tee's
  if [ $rc -ne 0 ]; then
    echo "### $tag FAILED rc=$rc" | tee -a "$OUT"
    tail -5 /tmp/bench_err.log | tee -a "$OUT"
  fi
}

# multipass configs
run config2 BENCH_CONFIG=2
run config4 BENCH_CONFIG=4
run config3_auto BENCH_CONFIG=3
run config3_xml BENCH_CONFIG=3 BENCH_MESH_SLABS=xml
# big-scene forward paths (early-exit + multipass effects)
run house_grid_path BENCH_SCENE=house BENCH_GRID=1
run house_grid_direct BENCH_SCENE=house BENCH_GRID=1 BENCH_BOUNCES=0
run molecule_grid_path BENCH_SCENE=spheres BENCH_NSPHERES=9018 BENCH_GRID=1
run molecule_grid_direct BENCH_SCENE=spheres BENCH_NSPHERES=9018 \
    BENCH_GRID=1 BENCH_BOUNCES=0
# headline + train re-confirmation
run config5_headline BENCH_CONFIG=5
run cornell_train BENCH_MODE=train
# edge-aware train (cornell through the Pallas soft backward)
run edge_train_512 BENCH_MODE=train BENCH_EDGE=1 BENCH_WIDTH=512 \
    BENCH_HEIGHT=512
# teapot edge train: vectorized chunked soft backward (value route)
run teapot_edge_train BENCH_SCENE=teapot BENCH_MODE=train BENCH_EDGE=1 \
    BENCH_WIDTH=512 BENCH_HEIGHT=512
# house grid-mode train through the Pallas chunk backward (long compile)
run house_grid_train BENCH_SCENE=house BENCH_MODE=train BENCH_WIDTH=512 \
    BENCH_HEIGHT=512 BENCH_GRID=1
echo "### DONE [$(date +%H:%M:%S)]" | tee -a "$OUT"
