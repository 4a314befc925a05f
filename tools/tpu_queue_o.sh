#!/bin/bash
# Queue O (round 3, session 8): fresh container; bench already run by the
# session driver. Strictly serialized (1-CPU host).
# 1: dataset regeneration (outputs/kitti_syn + vkitti_syn wiped with the container)
# 2: full test suite sanity (CPU)
# 3-4: flat step profile + dispatch-cycle profile at the flipped (96,32) flagship
# 5: 30k A/B arm — num_nerf_samples_per_ray 32 (baseline = r3prop/p96-32, 25.12)
# 6: batch-32k dispatch probe (throughput only)
# 7: inpainting rung 2 (queue M leftover: 8 clips, 224^2, held-out scene)
# 8: vanilla temporal-distortion arm (queue M leftover, lowest priority)
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

python tools/regen_data.py > /tmp/regen_data.log 2>&1
echo REGEN_EXIT=$?

timeout 2400 python -m pytest tests/ -q > /tmp/pytest_r3s8.log 2>&1
echo PYTEST_EXIT=$?

timeout 2400 python tools/profile_step.py --batch 16384 > /tmp/profstep_9632.log 2>&1
echo PROFSTEP_EXIT=$?

timeout 2400 python tools/profile_dispatch.py --dispatches 8 > /tmp/profdisp_9632.log 2>&1
echo PROFDISP_EXIT=$?

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

timeout 1200 python tools/profile_dispatch.py --dispatches 6 --batch 32768 > /tmp/profdisp_32k.log 2>&1
echo DISP32K_EXIT=$?

echo QUEUE_O_CORE_DONE

timeout 10800 python tools/validate_inpaint.py --clips 8 --size 224 --steps 5000 \
  --frames 24 --heldout-scene --out outputs/inpaint_scaled2 \
  > /tmp/inpaint_scaled2.log 2>&1
echo INPAINT2_EXIT=$?

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

echo QUEUE_O_ALL_DONE
