#!/bin/bash
set -x
# wait for the ilf profile A/B to release the chip
while kill -0 $(cat /tmp/ilf_ab.pid) 2>/dev/null; do sleep 20; done
cd /root/repo
FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.interlevel_ray_fraction 0.25 \
  --trainer.output_dir outputs/r3ilf --trainer.experiment_name ilf025 > /tmp/ilf025_30k.log 2>&1
echo ILF025_30K_EXIT=$?
timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.interlevel_ray_fraction 0.5 \
  --trainer.output_dir outputs/r3ilf --trainer.experiment_name ilf050 > /tmp/ilf050_30k.log 2>&1
echo ILF050_30K_EXIT=$?
echo QUEUE_Q_DONE
