#!/bin/bash
# Queue P (round 3, session 9): runs after queue O's core items.
# Reorders queue O's tail to put the single-proposal-round A/B arms first
# (flagship perf lever: drops one pdf round + one proposal field eval),
# then the inpaint rung-2 and vanilla temporal-distortion leftovers.
# 1: 30k arm — single proposal level (96,), 48 nerf samples
# 2: 30k arm — single proposal level (96,), 32 nerf samples (stacks with n32)
# 3: inpainting rung 2 (8 clips, 224^2, held-out scene)
# 4: vanilla temporal-distortion arm (lowest priority)
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"

timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.num_proposal_iterations 1 \
  --model.num_proposal_samples_per_ray 96 \
  --model.proposal_max_res 256 \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name p96only \
  > /tmp/prop_p96only.log 2>&1
echo P96ONLY_EXIT=$?

timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.num_proposal_iterations 1 \
  --model.num_proposal_samples_per_ray 96 \
  --model.proposal_max_res 256 \
  --model.num_nerf_samples_per_ray 32 \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name p96only-n32 \
  > /tmp/prop_p96only_n32.log 2>&1
echo P96ONLY_N32_EXIT=$?

echo QUEUE_P_ARMS_DONE

timeout 10800 python tools/validate_inpaint.py --clips 8 --size 224 --steps 5000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
  > /tmp/inpaint_scaled2.log 2>&1
echo INPAINT2_EXIT=$?

# restore the PARITY-cited v30k-aabb2 evidence (metrics.jsonl lost to the
# container wipe before it was committed): identical flags to queue K's run
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

echo QUEUE_P_ALL_DONE
