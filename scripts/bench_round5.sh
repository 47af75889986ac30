#!/bin/bash
# Round-5 bench matrix: run serially on the one TPU chip, append JSON+tag
# lines to the output file. EVERY row gets pasted into BASELINE.md (the
# round-4 VERDICT's "close the books" item). Usage:
#   bash scripts/bench_round5.sh [outfile] [section]
# section: all | train | fwd | multipass | edge (default all)
OUT=${1:-/tmp/bench_r5.jsonl}
SEC=${2:-all}
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

want() { [ "$SEC" = all ] || [ "$SEC" = "$1" ]; }

if want train; then
  # ---- the round-5 headline: teapot 512^2 b5 train A/B across backward
  # routes (BENCH_BWD_IMPL makes this reproducible; VERDICT weak #5) ----
  run teapot_grid_train_cell BENCH_SCENE=teapot BENCH_MODE=train \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRID=1 \
      BENCH_GRAD_WRT=sph,mat,tri BENCH_BWD_IMPL=cell
  run teapot_stream_train_cell BENCH_SCENE=teapot BENCH_MODE=train \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRAD_WRT=sph,mat,tri \
      BENCH_BWD_IMPL=cell
  run teapot_xla_fallback BENCH_SCENE=teapot BENCH_MODE=train \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRAD_WRT=sph,mat,tri \
      BENCH_MEGA=0
  # big-asset + molecule grid training through the cell route
  run house_grid_train_cell BENCH_SCENE=house BENCH_MODE=train \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRID=1 \
      BENCH_GRAD_WRT=sph,mat,tri BENCH_BWD_IMPL=cell
  run molecule_grid_train_cell BENCH_SCENE=spheres BENCH_NSPHERES=9018 \
      BENCH_MODE=train BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRID=1 \
      BENCH_BWD_IMPL=cell
  # cornell-class regression (unrolled tables stay on the pallas route)
  run cornell_train BENCH_MODE=train
  # round-4 Pallas chunk backward A/B row (LAST: ~25 min relay compile)
  run teapot_grid_train_pallas BENCH_SCENE=teapot BENCH_MODE=train \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRID=1 \
      BENCH_GRAD_WRT=sph,mat,tri BENCH_BWD_IMPL=pallas
fi

if want fwd; then
  run config5_headline BENCH_CONFIG=5
  run house_grid_path BENCH_SCENE=house BENCH_GRID=1
  run house_grid_direct BENCH_SCENE=house BENCH_GRID=1 BENCH_BOUNCES=0
  run house_stream_path BENCH_SCENE=house
  run molecule_grid_path BENCH_SCENE=spheres BENCH_NSPHERES=9018 \
      BENCH_GRID=1
  run molecule_grid_direct BENCH_SCENE=spheres BENCH_NSPHERES=9018 \
      BENCH_GRID=1 BENCH_BOUNCES=0
fi

if want multipass; then
  run config2 BENCH_CONFIG=2
  run config4 BENCH_CONFIG=4
  run config3_auto BENCH_CONFIG=3
  run config3_xml BENCH_CONFIG=3 BENCH_MESH_SLABS=xml
fi

if want edge; then
  run edge_train_512 BENCH_MODE=train BENCH_EDGE=1 BENCH_WIDTH=512 \
      BENCH_HEIGHT=512
  run teapot_edge_train BENCH_SCENE=teapot BENCH_MODE=train BENCH_EDGE=1 \
      BENCH_WIDTH=512 BENCH_HEIGHT=512 BENCH_GRAD_WRT=sph,mat,tri
fi

if want evidence; then
  # round-5 evidence artifacts (each prints one JSON line)
  evrun() {
    tag=$1; shift
    echo "### $tag [$(date +%H:%M:%S)]" | tee -a "$OUT"
    env PYTHONPATH="$PWD:/root/.axon_site" timeout 3600 "$@" \
      2>/tmp/bench_err.log | tail -1 | tee -a "$OUT"
    rc=${PIPESTATUS[0]}
    [ $rc -ne 0 ] && { echo "### $tag FAILED rc=$rc" | tee -a "$OUT";
                       tail -5 /tmp/bench_err.log | tee -a "$OUT"; }
  }
  evrun tpu_golden_tie python scripts/tpu_golden_tie.py 256
  evrun grad_parity_1024 python scripts/grad_parity_1024.py
  evrun cell_backward_tpu python scripts/verify_cell_tpu.py
  evrun viewer_evidence python scripts/viewer_evidence.py 240
fi
