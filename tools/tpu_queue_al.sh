#!/bin/bash
# Queue AL (round 4): verdict asks #1 (orphan restores), #3 (gap ablation),
# #7 (vanilla dense-coverage) + fresh bench. Runs after queue AK drains.
# Order: measurement first (cheap, unblocks the perf story), then 30k arms.
# Every study JSON write is guarded (no empty evidence files — ADVICE r3).
set -x
cd /root/repo
echo $$ > /tmp/queue_al.pid
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

if [ -f /tmp/queue_ak.pid ]; then
  while kill -0 "$(cat /tmp/queue_ak.pid)" 2>/dev/null; do sleep 60; done
fi

# 1. scanned-vs-flat gap itemization (verdict #3) at the flagship point
timeout 3600 python tools/profile_dispatch.py --dispatches 8 --ablate \
  > /tmp/profdisp_ablate.log 2>&1
echo ABLATE_EXIT=$?

# 2. fresh driver-protocol bench on the uncontended chip
timeout 1800 python bench.py > /tmp/bench_r4.log 2>&1
echo BENCH_EXIT=$?
cp /tmp/bench_r4.log outputs/bench/bench_r4s1.log

# 3. r3prop tail arms (30k each, identical protocol to the flagship A/B)
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

# 4. r3dyn masked arm (the 24.95 static-PSNR row; post-depth-fix units)
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

# 5. vanilla-nerf on dense coverage (verdict #7): 128x128 orbit, 28/4 split
mkdir -p outputs/vanilla_orbit
timeout 7200 python tools/study_vanilla.py --steps 30000 --eval-every 3000 \
  > /tmp/vanilla_orbit.log 2>&1
echo VANILLA_ORBIT_EXIT=$?
grep '^{' /tmp/vanilla_orbit.log | tail -1 | grep . \
  > outputs/vanilla_orbit/result.json \
  || { echo 'VANILLA_ORBIT evidence missing' >&2; rm -f outputs/vanilla_orbit/result.json; }

# 6. fixed-protocol segmenter cross-rung eval (verdict #6): both checkpoints
# on the SAME 8-scene held-out set
timeout 3600 python tools/train_segmenter.py --eval-scenes 8 --frames 5 \
  --eval-ckpt outputs/segmenter2/segmenter.npz --out outputs/segmenter_xeval/rung2 \
  > /tmp/seg_xeval_r2.log 2>&1
echo SEG_XEVAL_R2_EXIT=$?
if [ -f outputs/segmenter3/segmenter.npz ]; then
  timeout 3600 python tools/train_segmenter.py --eval-scenes 8 --frames 5 \
    --eval-ckpt outputs/segmenter3/segmenter.npz --out outputs/segmenter_xeval/rung3 \
    > /tmp/seg_xeval_r3.log 2>&1
  echo SEG_XEVAL_R3_EXIT=$?
fi

echo QUEUE_AL_DONE
