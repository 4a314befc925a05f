#!/bin/bash
# Queue H: reruns of queue-G items 2-4 which failed on the tools/ sys.path
# gap (fixed by the repo-root shim in each tools script). Run AFTER queue G
# so the profiles and the A/B see an idle chip.
set -x
cd /root/repo
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

# dispatch-cycle attribution (compressed vs not)
timeout 2400 python tools/profile_dispatch.py --dispatches 8 > /tmp/profdisp_plain.log 2>&1
echo PD1_EXIT=$?
timeout 2400 python tools/profile_dispatch.py --dispatches 8 --compress > /tmp/profdisp_comp.log 2>&1
echo PD2_EXIT=$?

# full-step profile at the flagship point (tile fix delta)
timeout 2400 python tools/profile_step.py --batch 16384 --field fourier --iters 20 \
  fourier_basis=tri max_res=64 base_res=4 hidden_dim=128 num_layers=3 \
  'num_proposal_samples_per_ray=[128, 48]' stop_grad_sampling=true \
  > /tmp/profile_r3s4.log 2>&1
echo PROFILE_EXIT=$?

# capacity-matched tri arm of the field A/B
timeout 3600 python tools/study_field.py --field fourier --steps 30000 --batch 4096 \
  --scan-steps 50 --eval-every 3000 --name tri_ab_big \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128, 48]' fourier_basis=tri \
  fourier_anneal_steps=3000 stop_grad_sampling=true \
  > /tmp/study_tri_ab_big.log 2>&1
echo TRI_BIG_EXIT=$?

echo QUEUE_H_DONE
