#!/bin/bash
# Queue AO (round 5, v2): supersedes queue AN. Order:
#   0. wait for queue AM to drain
#   1. QUIET WINDOW (AK paused via /proc-children walk): flat profile_step,
#      profile_dispatch --ablate (fixed-step + ALL-combined arms), AND the
#      r5 driver bench — the first contention-free measurement set; rounds
#      3/4 driver benches ran with background queues on the chip (the
#      1.18M-vs-1.65M mystery), so these numbers are the honest ones
#   2. appearance-embedding A/B at the 30k capacity point (verdict r4 #7)
#   3. segmenter boundary rung IF enough wall-clock remains (cutoff below),
#      gated on AK's drain; else full test suite immediately
set -x
cd /root/repo
echo $$ > /tmp/queue_ao.pid
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

if [ -f /tmp/queue_am.pid ]; then
  while kill -0 "$(cat /tmp/queue_am.pid)" 2>/dev/null; do sleep 60; done
fi

descendants() {
  local p=$1 c
  for c in $(cat /proc/"$p"/task/"$p"/children 2>/dev/null); do
    echo "$c"; descendants "$c"
  done
}
AK=$(cat /tmp/queue_ak.pid 2>/dev/null)
AKPIDS=""
if [ -n "$AK" ] && kill -0 "$AK" 2>/dev/null; then
  AKPIDS="$AK $(descendants "$AK")"
  for p in $AKPIDS; do kill -STOP "$p" 2>/dev/null; done
  echo "paused AK tree for quiet measurement window: $AKPIDS"
fi
mkdir -p outputs/profile outputs/bench
timeout 2400 python tools/profile_step.py --batch 16384 \
  > outputs/profile/step_flat_r5.log 2>&1
echo PROFSTEP_EXIT=$?
timeout 3600 python tools/profile_dispatch.py --dispatches 8 --ablate \
  > outputs/profile/dispatch_ablate_r5.log 2>&1
echo ABLATE_R5_EXIT=$?
timeout 2400 python bench.py > outputs/bench/bench_r5.log 2>&1
echo BENCH_R5_EXIT=$?
grep '^{' outputs/bench/bench_r5.log | tail -2
if [ -n "$AKPIDS" ]; then
  for p in $AKPIDS; do kill -CONT "$p" 2>/dev/null; done
  echo "resumed AK tree"
fi

# ---- 2. appearance A/B at the capacity point (30k, half-image eval fit) --
CAP="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.base_res 4 --model.max_res 1024 --model.hidden_dim 384 \
 --model.fourier_num_levels 20 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 2000 \
 --trainer.max_num_iterations 30000 --trainer.eval_fit_appearance_steps 100 \
 --trainer.output_dir outputs/r5app"
timeout 3600 python train_nerfacto.py nerfacto-tpu $CAP \
  --model.appearance_embedding_dim 0 \
  --trainer.experiment_name e0 > /tmp/r5app_e0.log 2>&1
echo APP_E0_EXIT=$?
timeout 3600 python train_nerfacto.py nerfacto-tpu $CAP \
  --model.appearance_embedding_dim 32 \
  --trainer.experiment_name e32 > /tmp/r5app_e32.log 2>&1
echo APP_E32_EXIT=$?

# ---- 3. boundary rung only if the round's wall budget allows -------------
if [ -n "$AK" ]; then
  while kill -0 "$AK" 2>/dev/null; do sleep 60; done
fi
# round end ~21:25 UTC; the rung needs ~2h15 (gen+train+eval) + suite 25 min
NOW=$(date -u +%H%M)
if [ "$NOW" -lt 1845 ]; then
  timeout 9000 python tools/train_segmenter.py --scenes 96 --eval-scenes 8 \
    --frames 5 --steps 10000 --boundary-gain 4 \
    --out outputs/segmenter4_boundary \
    > /tmp/segmenter4_boundary.log 2>&1
  echo SEG4_BOUNDARY_EXIT=$?
else
  echo SEG4_BOUNDARY_SKIPPED_WALL_CLOCK
fi

timeout 3600 python -m pytest tests/ -q > /tmp/pytest_full_ao.log 2>&1
echo PYTEST_EXIT=$?
tail -3 /tmp/pytest_full_ao.log
echo QUEUE_AO_DONE
