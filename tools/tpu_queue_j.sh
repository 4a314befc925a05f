#!/bin/bash
# Queue J (round 3, session 5): takes over from queue I after the in-flight
# cap2/h512 run (left to finish as an orphan). Reordered remainder: the l20
# capacity rung, then the short perf probes (depth-loss ablation + the
# re-benched driver metric with pre-sampled scan xs), then the studies.
# Usage: bash tools/tpu_queue_j.sh <h512_pid>
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

H512_PID=${1:-0}
if [ "$H512_PID" != "0" ]; then
  while kill -0 "$H512_PID" 2>/dev/null; do sleep 30; done
fi

# 1. capacity rung 2, remaining axis (levels 20)
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

# 2. short perf probes
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --no-depth \
  > /tmp/profdisp_nodepth.log 2>&1
echo PD_NODEPTH_EXIT=$?
timeout 2400 python bench.py > /tmp/bench_r3s5.log 2>&1
echo BENCH2_EXIT=$?

# 3. masked-arm dyn rerun (semantic-nerfw loss-level masking)
DYN="--dataparser.data_dir outputs/kitti_dyn --dataparser.first_frame 0 --dataparser.last_frame 24 \
 --dataparser.image_height 188 --dataparser.image_width 621 --dataparser.train_split_fraction 0.8 \
 --dataparser.mask_dir outputs/kitti_dyn/mask --dataparser.depth_unit_scale_factor 1.0 \
 --dataparser.semantics_dir outputs/kitti_dyn/sem --model.num_semantic_classes 4 \
 --model.field_type fourier --model.fourier_basis tri --model.max_res 64 --model.base_res 4 \
 --model.appearance_embedding_dim 0 --datamanager.train_num_rays_per_batch 8192 \
 --model.mono_depth_loss_mult 0 --model.use_depth false \
 --trainer.steps_per_dispatch 50 --trainer.max_num_iterations 30000 \
 --trainer.steps_per_eval_image 5000 --trainer.steps_per_eval_batch 5000 \
 --trainer.steps_per_eval_all_images 30000 --trainer.steps_per_save 30000 \
 --trainer.log_every 1000 --trainer.output_dir outputs/r3dyn"
timeout 3600 python train.py semantic-nerfw $DYN \
  --model.use_mask true \
  --trainer.experiment_name masked-fixed > /tmp/dyn_masked30k_fixed.log 2>&1
echo DYN_MASKED_FIXED_EXIT=$?

# 4. vanilla-nerf 30k convergence (aabb collider arm) — VERDICT missing #5
timeout 9000 python train_nerf.py \
  --dataparser.data_dir outputs/vkitti_syn \
  --datamanager.train_num_rays_per_batch 4096 \
  --trainer.steps_per_dispatch 25 --trainer.max_num_iterations 30000 \
  --trainer.steps_per_eval_image 3000 --trainer.steps_per_eval_batch 3000 \
  --trainer.steps_per_eval_all_images 10000 --trainer.steps_per_save 10000 \
  --trainer.log_every 1000 \
  --model.enable_temporal_distortion false \
  --trainer.output_dir outputs/r3vanilla --trainer.experiment_name v30k-aabb2 \
  > /tmp/vanilla30k_aabb2.log 2>&1
echo VANILLA_AABB2_EXIT=$?

# 5. segmenter rung 2
timeout 5400 python tools/train_segmenter.py --scenes 48 --eval-scenes 6 \
  --frames 5 --steps 6000 --out outputs/segmenter2 \
  > /tmp/segmenter2.log 2>&1
echo SEG2_EXIT=$?

# 6. inpainting scale-up 2
timeout 8000 python tools/validate_inpaint.py --clips 8 --size 224 --steps 6000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
  > /tmp/inpaint_scaled2.log 2>&1
echo INPAINT2_EXIT=$?

# 7. vanilla TD arm (lowest priority)
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

echo QUEUE_J_DONE
