#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_v.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --dataparser.semantics_dir outputs/kitti_syn/sem --dataparser.mask_dir outputs/kitti_syn/mask \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 3600 python train.py semantic-nerfw $FLAG \
  --model.field_type fourier --model.fourier_basis tri --model.max_res 256 --model.base_res 4 \
  --model.hidden_dim 128 --model.num_proposal_samples_per_ray "(96,32)" \
  --model.stop_grad_sampling true --model.interlevel_ray_fraction 0.5 \
  --trainer.output_dir outputs/r3sem --trainer.experiment_name sem30k-flagship2 \
  > /tmp/sem30k_flagship2.log 2>&1
echo SEM30K2_EXIT=$?
echo QUEUE_W_DONE
