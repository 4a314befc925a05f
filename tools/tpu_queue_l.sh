#!/bin/bash
# Queue L (round 3, session 6): continues after the orphaned v30k-aabb2 run.
# 1-2: measure the hoisted-ray-generation change (profile A/B + driver bench)
# 3:   capacity rung 2, remaining axis (levels 20)
# 4-5: flagship proposal-budget 30k A/B at the reference operating point —
#      gates flipping methods.py nerfacto-tpu to (96, 32)
# 6-7: segmenter + inpainting scale-ups
# 8-9: capacity h512 axis, vanilla TD arm (lowest priority)
# Usage: bash tools/tpu_queue_l.sh <vanilla_pid>
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

VPID=${1:-0}
if [ "$VPID" != "0" ]; then
  while kill -0 "$VPID" 2>/dev/null; do sleep 30; done
fi

# 1. dispatch profile: hoisted (opt-in --hoist) vs in-scan (the default)
# (flag updated after 72332d0 flipped the default: hoist measured slower)
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --no-depth --hoist \
  > /tmp/profdisp_hoist.log 2>&1
echo PD_HOIST_EXIT=$?
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --no-depth \
  > /tmp/profdisp_nohoist.log 2>&1
echo PD_NOHOIST_EXIT=$?

# 2. driver bench with the hoisted scan
timeout 2400 python bench.py > /tmp/bench_hoist.log 2>&1
echo BENCH_HOIST_EXIT=$?

# 3. capacity rung 2, remaining axis (levels 20)
BIG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.appearance_embedding_dim 0 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name l20 \
  > /tmp/cap2_l20.log 2>&1
echo CAP2_L20_EXIT=$?

# 4-5. flagship proposal-budget A/B at the reference operating point
# (same scene/steps/batch as the round-2 kitti30k-b16k row; only the
# proposal sample counts differ between arms)
FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name p128-48 \
  > /tmp/prop_128_48.log 2>&1
echo PROP_A_EXIT=$?
timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.num_proposal_samples_per_ray 96,32 \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name p96-32 \
  > /tmp/prop_96_32.log 2>&1
echo PROP_B_EXIT=$?

# 6. segmenter rung 2
timeout 5400 python tools/train_segmenter.py --scenes 48 --eval-scenes 6 \
  --frames 5 --steps 6000 --out outputs/segmenter2 \
  > /tmp/segmenter2.log 2>&1
echo SEG2_EXIT=$?

# 7. inpainting scale-up 2
timeout 8000 python tools/validate_inpaint.py --clips 8 --size 224 --steps 6000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
  > /tmp/inpaint_scaled2.log 2>&1
echo INPAINT2_EXIT=$?

# 8. capacity rung 2, width axis
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 1024 --model.hidden_dim 512 --model.fourier_num_levels 16 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name h512 \
  > /tmp/cap2_h512.log 2>&1
echo CAP2_H512_EXIT=$?

# 9. vanilla TD arm (lowest priority)
timeout 9000 python train_nerf.py \
  --dataparser.data_dir outputs/vkitti_syn \
  --datamanager.train_num_rays_per_batch 4096 \
  --trainer.steps_per_dispatch 25 --trainer.max_num_iterations 30000 \
  --trainer.steps_per_eval_image 3000 --trainer.steps_per_eval_batch 3000 \
  --trainer.steps_per_eval_all_images 10000 --trainer.steps_per_save 10000 \
  --trainer.log_every 1000 \
  --trainer.output_dir outputs/r3vanilla --trainer.experiment_name v30k-td2 \
  > /tmp/vanilla30k_td2.log 2>&1
echo VANILLA_TD2_EXIT=$?

echo QUEUE_L_DONE
