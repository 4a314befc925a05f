#!/bin/bash
# Queue AH (round 3, session 12): runs after queue AG (horizon arms).
# 1: semantic-nerfw at the CAPACITY field (l20: max_res 1024, hidden 384,
#    20 fourier levels) — the reference's main method (train.py) at the
#    quality ceiling found by the capacity sweep; baseline to beat:
#    sem30k-flagship2 24.68 PSNR / 95.5% semantic acc @30k.
# 2: inpainting rung 3 — 12 clips at 256^2, 8000 steps, held-out scene
#    (rung 2: 8 clips 224^2 5000 steps -> masked PSNR 21.28 vs 13.78 fill).
# 3: segmenter rung 3 — 96 scenes, 10k steps (rung 2: 48 scenes/6k ->
#    0.5535 vs 0.3644 instance IoU).
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

SEM="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --dataparser.semantics_dir outputs/kitti_syn/sem --dataparser.mask_dir outputs/kitti_syn/mask \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.fourier_anneal_steps 8000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"
timeout 7200 python train.py semantic-nerfw $SEM \
  --model.field_type fourier --model.fourier_basis tri --model.base_res 4 \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --model.num_proposal_samples_per_ray "(96,32)" \
  --model.stop_grad_sampling true --model.interlevel_ray_fraction 0.5 \
  --trainer.output_dir outputs/r3sem --trainer.experiment_name sem30k-cap \
  > /tmp/sem30k_cap.log 2>&1
echo SEM_CAP_EXIT=$?

timeout 18000 python tools/validate_inpaint.py --clips 12 --size 256 --steps 8000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled3 \
  > /tmp/inpaint_scaled3.log 2>&1
echo INPAINT3_EXIT=$?

timeout 14400 python tools/train_segmenter.py --scenes 96 --eval-scenes 8 \
  --frames 5 --steps 10000 --out outputs/segmenter3 \
  > /tmp/segmenter3.log 2>&1
echo SEG3_EXIT=$?

echo QUEUE_AH_DONE
