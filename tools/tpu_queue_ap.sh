#!/bin/bash
# Queue AP (round 5 tail): quiet-chip probes closing the bench-vs-trainer
# step-time question, then the boundary-loss segmenter rung (fixed feed).
#   1. real-Trainer rate probe: 2500 steps at the EXACT flagship100k CLI,
#      no evals — the definitive uncontended trainer ms/step
#   2. profile_dispatch replica, now at the shipped op point (dim 0)
#   3. bench.py re-run (registry now dim 0)
#   4. segmenter boundary rung (device-resident feed, args not constants)
set -x
cd /root/repo
echo $$ > /tmp/queue_ap.pid
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 100000 \
 --trainer.steps_per_eval_batch 100000 --trainer.steps_per_eval_all_images 100000 \
 --trainer.steps_per_save 100000 --trainer.log_every 500 --trainer.max_num_iterations 2500"
timeout 1800 python train_nerfacto.py nerfacto-tpu $FLAG \
  --trainer.output_dir outputs/profile --trainer.experiment_name trainer_rate_probe \
  > /tmp/trainer_rate_probe.log 2>&1
echo TRAINER_PROBE_EXIT=$?
grep rays_per_sec outputs/profile/trainer_rate_probe/nerfacto-tpu/metrics.jsonl | tail -4

timeout 3600 python tools/profile_dispatch.py --dispatches 8 --ablate \
  > outputs/profile/dispatch_ablate_r5_dim0.log 2>&1
echo ABLATE_DIM0_EXIT=$?
grep -E "ms/step|baseline|ALL" outputs/profile/dispatch_ablate_r5_dim0.log | tail -10

timeout 2400 python bench.py > outputs/bench/bench_r5_dim0.log 2>&1
echo BENCH_DIM0_EXIT=$?
grep '^{' outputs/bench/bench_r5_dim0.log | tail -1

timeout 9000 python tools/train_segmenter.py --scenes 96 --eval-scenes 8 \
  --frames 5 --steps 10000 --boundary-gain 4 \
  --out outputs/segmenter4_boundary \
  > /tmp/segmenter4_boundary2.log 2>&1
echo SEG4_BOUNDARY_EXIT=$?
tail -20 /tmp/segmenter4_boundary2.log
echo QUEUE_AP_DONE
