#!/bin/bash
# Queue AG (round 3, session 12): training-horizon study.
# Every quality number so far stops at 30k steps (the reference protocol,
# train.py:49). Nothing tests whether the flagship / capacity operating
# points keep climbing at 60-100k steps — at 1.3M (flagship) / 680k
# (capacity) rays/s these horizons cost minutes, so the speed x quality
# Pareto extends along a THIRD axis (wall-clock at fixed hardware) that the
# gather-bound reference cannot reach. Evals every 25k, curve every 10k.
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 25000 \
 --trainer.steps_per_save 100000 --trainer.log_every 2000 --trainer.max_num_iterations 100000"

# 1: flagship operating point, 100k-step horizon (30k baseline: 25.12)
timeout 5400 python train_nerfacto.py nerfacto-tpu $FLAG \
  --trainer.output_dir outputs/r3horizon --trainer.experiment_name flagship100k \
  > /tmp/horizon_flagship.log 2>&1
echo HORIZON_FLAGSHIP_EXIT=$?

# 2: capacity point (l20: max_res 1024, hidden 384, levels 20; 30k baseline:
#    ~27.0 @682k rays/s), 100k-step horizon, anneal stretched with capacity
BIGH="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.appearance_embedding_dim 0 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 25000 \
 --trainer.steps_per_save 100000 --trainer.log_every 2000 --trainer.max_num_iterations 100000"
timeout 9000 python train_nerfacto.py nerfacto-tpu $BIGH \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --trainer.output_dir outputs/r3horizon --trainer.experiment_name cap100k \
  > /tmp/horizon_cap.log 2>&1
echo HORIZON_CAP_EXIT=$?

echo QUEUE_AG_DONE
