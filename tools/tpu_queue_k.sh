#!/bin/bash
# Queue K (round 3, session 6): fresh container — datasets regenerated, /tmp
# queues I/J never completed. Highest-value-first: the driver bench sanity,
# the profile_dispatch --no-depth PARITY placeholder, then the three runs
# that fill literal holes (dyn masked row, vanilla 30k convergence,
# capacity rung 2), then the scale-ups.
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

python tools/make_lpips_ckpt.py outputs/lpips_random
echo LPIPS_CKPT_EXIT=$?

# 1. driver bench, fresh container (scan-xs sampling change needs a number)
timeout 2400 python bench.py > /tmp/bench_r3s6.log 2>&1
echo BENCH_EXIT=$?

# 2. dispatch attribution without the depth loss (PARITY placeholder row)
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --no-depth \
  > /tmp/profdisp_nodepth.log 2>&1
echo PD_NODEPTH_EXIT=$?

# 3. masked-arm dyn rerun (fills the r3dyn table row in PARITY.md)
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

# 5. capacity rung 2, one axis at a time above the round-3 combined point
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
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 1024 --model.hidden_dim 512 --model.fourier_num_levels 16 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name h512 \
  > /tmp/cap2_h512.log 2>&1
echo CAP2_H512_EXIT=$?

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

# 8. capacity rung 2, third axis (lowest priority of the rung)
timeout 3600 python train_nerfacto.py nerfacto-tpu $BIG \
  --model.max_res 2048 --model.hidden_dim 384 --model.fourier_num_levels 16 \
  --trainer.output_dir outputs/r3cap2 --trainer.experiment_name mr2048 \
  > /tmp/cap2_mr2048.log 2>&1
echo CAP2_MR_EXIT=$?

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

echo QUEUE_K_DONE
