#!/bin/bash
# Queue AJ (round 3, session 14 — fresh container, checkpoints lost):
# 1: fresh driver-protocol bench at HEAD (records the round-3 headline with
#    the honest loop-varying-index scanned protocol).
# 2: re-run the 100k-step capacity-arm horizon from scratch (queue AG/AI's
#    runs were cut by container restarts at 62k; best-ever 27.33 PSNR @50k
#    with the train curve still climbing). Saves every 25k so the next
#    restart resumes via --trainer.load_dir.
# 3: semantic-nerfw capacity showcase re-run (30k; the sem30k-cap checkpoint
#    needed for the 60k extension died with the container) then extend to
#    60k from its own checkpoint.
set -x
cd /root/repo

# wait for the dataset regen (fresh container)
while [ ! -f /tmp/regen.log ] || ! grep -q DONE /tmp/regen.log; do sleep 20; done

mkdir -p outputs/lpips_random
[ -f outputs/lpips_random/vgg16_features.pth ] || python tools/make_lpips_ckpt.py outputs/lpips_random
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

mkdir -p outputs/bench
timeout 2400 python bench.py > outputs/bench/bench_r3s14.log 2>&1
echo BENCH_EXIT=$?
tail -2 outputs/bench/bench_r3s14.log

BIGH="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.appearance_embedding_dim 0 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 25000 \
 --trainer.steps_per_save 25000 --trainer.log_every 2000 --trainer.max_num_iterations 100000"
RESUME=""
if ls outputs/r3horizon/cap100k3/nerfacto-tpu/ckpt_* >/dev/null 2>&1; then
  RESUME="--trainer.load_dir outputs/r3horizon/cap100k3/nerfacto-tpu"
fi
timeout 14400 python train_nerfacto.py nerfacto-tpu $BIGH $RESUME \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --trainer.output_dir outputs/r3horizon --trainer.experiment_name cap100k3 \
  > /tmp/horizon_cap3.log 2>&1
echo HORIZON_CAP3_EXIT=$?
grep -h eval_all /tmp/horizon_cap3.log | tail -4

SEM="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --dataparser.semantics_dir outputs/kitti_syn/sem --dataparser.mask_dir outputs/kitti_syn/mask \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.fourier_anneal_steps 8000 --model.appearance_embedding_dim 0 \
 --model.field_type fourier --model.fourier_basis tri --model.base_res 4 \
 --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
 --model.num_proposal_samples_per_ray (96,32) \
 --model.stop_grad_sampling true --model.interlevel_ray_fraction 0.5 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 2000"
RESUME2=""
if ls outputs/r3sem/sem30k-cap2/semantic-nerfw/ckpt_* >/dev/null 2>&1; then
  RESUME2="--trainer.load_dir outputs/r3sem/sem30k-cap2/semantic-nerfw"
fi
timeout 7200 python train.py semantic-nerfw $SEM $RESUME2 \
  --trainer.max_num_iterations 30000 \
  --trainer.output_dir outputs/r3sem --trainer.experiment_name sem30k-cap2 \
  > /tmp/sem30k_cap2.log 2>&1
echo SEM30K_EXIT=$?

timeout 7200 python train.py semantic-nerfw $SEM \
  --trainer.max_num_iterations 60000 \
  --trainer.load_dir outputs/r3sem/sem30k-cap2/semantic-nerfw \
  --trainer.output_dir outputs/r3sem --trainer.experiment_name sem60k-cap2 \
  > /tmp/sem60k_cap2.log 2>&1
echo SEM60K_EXIT=$?

echo QUEUE_AJ_DONE
