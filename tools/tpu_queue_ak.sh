#!/bin/bash
# Queue AK (round 3, session 14): restore PARITY-cited evidence artifacts
# lost with the container restart (they were never force-added to git —
# now they will be, as each lands). Ordered fast-first:
# 1: field A/B tri arm @1800 (equal-protocol table, PARITY "Equal-protocol
#    field A/B") -> outputs/field_ab/tri_ab.json
# 2: flagship 100k-step horizon (wall-clock-to-PSNR table + horizon
#    section) -> outputs/r3horizon/flagship100k/
# 3: field A/B hash arm @1800, scan-steps 2 (tunnel RPC timeout workaround,
#    queue AF note) -> outputs/field_ab/hash_ab.json  [~85 min]
# 4: segmenter rung 3 (96 scenes, 10k steps) -> outputs/segmenter3/
# 5: inpaint rung 3 (12 clips, 256^2, 8000 steps) -> outputs/inpaint_scaled3/
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

if [ -f /tmp/queue_aj.pid ]; then
  while kill -0 "$(cat /tmp/queue_aj.pid)" 2>/dev/null; do sleep 60; done
fi

mkdir -p outputs/field_ab

timeout 1800 python tools/study_field.py --field fourier --steps 1800 \
  --eval-every 300 --name tri_ab \
  max_res=64 base_res=4 hidden_dim=128 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_ab5.log 2>&1
echo TRI_AB_EXIT=$?
grep '^{' /tmp/tri_ab5.log | tail -1 > outputs/field_ab/tri_ab.json

FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 25000 \
 --trainer.steps_per_save 100000 --trainer.log_every 2000 --trainer.max_num_iterations 100000"
timeout 5400 python train_nerfacto.py nerfacto-tpu $FLAG \
  --trainer.output_dir outputs/r3horizon --trainer.experiment_name flagship100k \
  > /tmp/horizon_flagship2.log 2>&1
echo HORIZON_FLAGSHIP_EXIT=$?

timeout 9000 python tools/study_field.py --field hash --steps 1800 \
  --eval-every 300 --scan-steps 2 --name hash_ab \
  > /tmp/hash_ab5.log 2>&1
echo HASH_AB_EXIT=$?
grep '^{' /tmp/hash_ab5.log | tail -1 > outputs/field_ab/hash_ab.json

timeout 14400 python tools/train_segmenter.py --scenes 96 --eval-scenes 8 \
  --frames 5 --steps 10000 --out outputs/segmenter3 \
  > /tmp/segmenter3b.log 2>&1
echo SEG3_EXIT=$?

timeout 18000 python tools/validate_inpaint.py --clips 12 --size 256 --steps 8000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled3 \
  > /tmp/inpaint_scaled3b.log 2>&1
echo INPAINT3_EXIT=$?

echo QUEUE_AK_DONE
