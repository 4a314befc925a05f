#!/bin/bash
# Queue I (round 3, session 5): remaining TPU work in descending
# value-per-minute. Queue G's bench already recorded 1.037M rays/s; items
# 2-4 of G failed on the tools/ sys.path gap (fixed), item 5's first run
# was killed at step 11k by the session restart, 6-10 never started.
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

# 1. dispatch-cycle attribution (compressed vs not)
timeout 2400 python tools/profile_dispatch.py --dispatches 8 > /tmp/profdisp_plain.log 2>&1
echo PD1_EXIT=$?
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --compress > /tmp/profdisp_comp.log 2>&1
echo PD2_EXIT=$?

# 2. full-step profile at the flagship point (tile fix delta)
timeout 2400 python tools/profile_step.py --batch 16384 --field fourier --iters 20 \
  fourier_basis=tri max_res=64 base_res=4 hidden_dim=128 num_layers=3 \
  'num_proposal_samples_per_ray=[128, 48]' stop_grad_sampling=true \
  > /tmp/profile_r3s4.log 2>&1
echo PROFILE_EXIT=$?

# 3. capacity-matched tri arm of the field A/B (closes the A/B story)
timeout 3600 python tools/study_field.py --field fourier --steps 30000 --batch 4096 \
  --scan-steps 50 --eval-every 3000 --name tri_ab_big \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128, 48]' fourier_basis=tri \
  fourier_anneal_steps=3000 stop_grad_sampling=true \
  > /tmp/study_tri_ab_big.log 2>&1
echo TRI_BIG_EXIT=$?

# 4. capacity rung 2, one axis at a time above the round-3 combined point
BIG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.appearance_embedding_dim 0 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 2048 --model.hidden_dim 384 --model.fourier_num_levels 16 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name mr2048 \
  > /tmp/cap2_mr2048.log 2>&1
echo CAP2_MR_EXIT=$?
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 1024 --model.hidden_dim 512 --model.fourier_num_levels 16 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name h512 \
  > /tmp/cap2_h512.log 2>&1
echo CAP2_H512_EXIT=$?
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name l20 \
  > /tmp/cap2_l20.log 2>&1
echo CAP2_L20_EXIT=$?

# 5. masked-arm dyn rerun (semantic-nerfw loss-level masking)
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

# 6. vanilla-nerf 30k convergence (aabb collider arm) — VERDICT missing #5
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

# 7. segmenter rung 2
timeout 5400 python tools/train_segmenter.py --scenes 48 --eval-scenes 6 \
  --frames 5 --steps 6000 --out outputs/segmenter2 \
  > /tmp/segmenter2.log 2>&1
echo SEG2_EXIT=$?

# 8. inpainting scale-up 2
timeout 8000 python tools/validate_inpaint.py --clips 8 --size 224 --steps 6000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
  > /tmp/inpaint_scaled2.log 2>&1
echo INPAINT2_EXIT=$?

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

echo QUEUE_I_DONE
