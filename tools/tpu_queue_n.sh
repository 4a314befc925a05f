#!/bin/bash
# Queue N (round 3, session 8): runs AFTER queue M completes.
# 1: fresh driver bench at the flipped (96,32) flagship
# 2: updated flat step profile at the flipped flagship
# 3: dispatch-cycle profile at the flipped flagship (true scanned cost)
# 4: 30k A/B arm — num_nerf_samples_per_ray 32 (baseline = r3prop/p96-32,
#    48 nerf samples, 25.12 all-images PSNR)
# 5: batch-32k sustained probe (3k steps, throughput only)
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

while ! grep -q QUEUE_M_DONE /tmp/queue_m.log 2>/dev/null; do sleep 60; done

timeout 2400 python bench.py > /tmp/bench_r3s8b.log 2>&1
echo BENCH_B_EXIT=$?

timeout 2400 python tools/profile_step.py --batch 16384 > /tmp/profstep_9632.log 2>&1
echo PROFSTEP_EXIT=$?

timeout 2400 python tools/profile_dispatch.py --dispatches 8 > /tmp/profdisp_9632.log 2>&1
echo PROFDISP_EXIT=$?

FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.num_nerf_samples_per_ray 32 \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name n32 \
  > /tmp/prop_n32.log 2>&1
echo N32_EXIT=$?

timeout 1200 python tools/profile_dispatch.py --dispatches 6 --batch 32768 > /tmp/profdisp_32k.log 2>&1
echo DISP32K_EXIT=$?

echo QUEUE_N_DONE  # (core items)

# 6-7. FALLBACK reruns: if queue M's segmenter/inpaint scale-ups timed out
# (1-CPU container contention), rerun them with bigger budgets.
if ! grep -q "SEG2_EXIT=0" /tmp/queue_m.log 2>/dev/null; then
  timeout 9000 python tools/train_segmenter.py --scenes 48 --eval-scenes 6 \
    --frames 5 --steps 5000 --out outputs/segmenter2 \
    > /tmp/segmenter2b.log 2>&1
  echo SEG2B_EXIT=$?
fi
if ! grep -q "INPAINT2_EXIT=0" /tmp/queue_m.log 2>/dev/null; then
  timeout 10800 python tools/validate_inpaint.py --clips 8 --size 224 --steps 5000 \
    --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
    > /tmp/inpaint_scaled2b.log 2>&1
  echo INPAINT2B_EXIT=$?
fi

echo QUEUE_N_ALL_DONE
