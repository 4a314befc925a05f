#!/bin/bash
# Queue AI (round 3, session 13): runs after queue AH (waits on its pid).
# 1: complete the 100k-step capacity-arm horizon (queue AG's cap100k was
#    cut at 62k by a container restart; best-ever 27.33 PSNR @50k and the
#    train curve was still climbing at 62k). Fresh run, saves every 25k so
#    a restart can resume via --trainer.load_dir.
# 2: fresh driver-protocol bench at HEAD (records the round-3 number with
#    the honest loop-varying-index scanned protocol).
# 3: extend the semantic-nerfw capacity showcase 30k -> 60k from its own
#    checkpoint (26.56 @30k; does the reference's main method keep climbing
#    like nerfacto does?).
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

# wait for queue AH to finish (segmenter rung 3 holds the chip)
if [ -f /tmp/queue_ah.pid ]; then
  while kill -0 "$(cat /tmp/queue_ah.pid)" 2>/dev/null; do sleep 60; done
fi

BIGH="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.appearance_embedding_dim 0 --model.fourier_anneal_steps 8000 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 25000 \
 --trainer.steps_per_save 25000 --trainer.log_every 2000 --trainer.max_num_iterations 100000"
RESUME=""
if ls outputs/r3horizon/cap100k2/nerfacto-tpu/ckpt_* >/dev/null 2>&1; then
  RESUME="--trainer.load_dir outputs/r3horizon/cap100k2/nerfacto-tpu"
fi
timeout 10800 python train_nerfacto.py nerfacto-tpu $BIGH $RESUME \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --trainer.output_dir outputs/r3horizon --trainer.experiment_name cap100k2 \
  > /tmp/horizon_cap2.log 2>&1
echo HORIZON_CAP2_EXIT=$?

mkdir -p outputs/bench
timeout 2400 python bench.py > outputs/bench/bench_r3s13.log 2>&1
echo BENCH_EXIT=$?
tail -1 outputs/bench/bench_r3s13.log

SEM="--dataparser.data_dir outputs/kitti_syn --dataparser.first_frame 0 --dataparser.last_frame 40 \
 --dataparser.image_height 375 --dataparser.image_width 1242 --dataparser.train_split_fraction 0.9 \
 --dataparser.use_depth true --dataparser.depth_unit_scale_factor 1.0 \
 --dataparser.semantics_dir outputs/kitti_syn/sem --dataparser.mask_dir outputs/kitti_syn/mask \
 --datamanager.train_num_rays_per_batch 16384 \
 --model.fourier_anneal_steps 8000 --model.appearance_embedding_dim 0 \
 --trainer.steps_per_dispatch 50 --trainer.steps_per_eval_image 10000 \
 --trainer.steps_per_eval_batch 10000 --trainer.steps_per_eval_all_images 30000 \
 --trainer.steps_per_save 30000 --trainer.log_every 2000 --trainer.max_num_iterations 60000"
timeout 7200 python train.py semantic-nerfw $SEM \
  --model.field_type fourier --model.fourier_basis tri --model.base_res 4 \
  --model.max_res 1024 --model.hidden_dim 384 --model.fourier_num_levels 20 \
  --model.num_proposal_samples_per_ray "(96,32)" \
  --model.stop_grad_sampling true --model.interlevel_ray_fraction 0.5 \
  --trainer.load_dir outputs/r3sem/sem30k-cap/semantic-nerfw \
  --trainer.output_dir outputs/r3sem --trainer.experiment_name sem60k-cap \
  > /tmp/sem60k_cap.log 2>&1
echo SEM60K_EXIT=$?

echo QUEUE_AI_DONE
