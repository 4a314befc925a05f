#!/bin/bash
# Queue AM (round 4, replaces AL): starts as soon as queue AK's hash_ab arm
# reports its exit (not when all of AK drains — AK's segmenter3/inpaint3
# stages are scene-gen/CPU-heavy and tolerate sharing), so the round's
# timing-sensitive and evidence-restoring runs fit before the driver bench.
#   1. scanned-vs-flat gap ablation (verdict #3) — first, quietest window
#   2. r3prop tail arms (pending evidence; PSNR is the claim — rays/s is
#      annotated as chip-shared in PARITY)
#   3. r3dyn masked arm (the 24.95 static-PSNR row)
#   4. vanilla-nerf dense-coverage orbit (verdict #7)
# All study JSON writes guarded (no empty evidence files).
set -x
cd /root/repo
echo $$ > /tmp/queue_am.pid
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

for i in $(seq 1 240); do
  grep -q 'HASH_AB_EXIT=' /tmp/queue_ak.log 2>/dev/null && break
  kill -0 "$(cat /tmp/queue_ak.pid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done

# 1. gap itemization at the flagship point
timeout 5400 python tools/profile_dispatch.py --dispatches 8 --ablate \
  > /tmp/profdisp_ablate.log 2>&1
echo ABLATE_EXIT=$?

# 2. r3prop tail arms (30k each, flagship protocol)
FLAG="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.max_res 256 --model.fourier_anneal_steps 5000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 5000 \
 --trainer.steps_per_eval_batch 5000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 1000 --trainer.max_num_iterations 30000"

timeout 3600 python train_nerfacto.py nerfacto-tpu $FLAG \
  --model.num_nerf_samples_per_ray 32 \
  --trainer.output_dir outputs/r3prop --trainer.experiment_name n32 \
  > /tmp/prop_n32.log 2>&1
echo N32_EXIT=$?

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

# 3. r3dyn masked arm
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
echo DYN_MASKED_EXIT=$?

# 4. vanilla-nerf dense coverage (verdict #7)
mkdir -p outputs/vanilla_orbit
timeout 7200 python tools/study_vanilla.py --steps 30000 --eval-every 3000 \
  > /tmp/vanilla_orbit.log 2>&1
echo VANILLA_ORBIT_EXIT=$?
grep '^{' /tmp/vanilla_orbit.log | tail -1 | grep . \
  > outputs/vanilla_orbit/result.json \
  || { echo 'VANILLA_ORBIT evidence missing' >&2; rm -f outputs/vanilla_orbit/result.json; }

# 5. TPU-compiled roofline numbers for docs/PERFORMANCE.md
timeout 1800 python tools/roofline.py --batch 16384 --step-ms 11.6 \
  > /tmp/roofline_tpu.log 2>&1
echo ROOFLINE_EXIT=$?

echo QUEUE_AM_DONE
