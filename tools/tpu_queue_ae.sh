#!/bin/bash
# Queue AE: capacity-matched tri arm at its stable lr, full 30k wall-clock
# horizon. Queue AC showed the (max_res 128, hidden 256, 12 levels) arm
# collapses at lr 1e-3 / anneal 1500 but is healthy at lr 5e-4 (eval 32.78
# @9k, peak 33.16) and at anneal 6000 (31.96 @9k). This run completes the
# wall-clock-matched A/B table at the stable operating point.
set -x
while kill -0 $(cat /tmp/queue_ad.pid) 2>/dev/null; do sleep 60; done
cd /root/repo
timeout 3600 python tools/study_field.py --field fourier --steps 30000 \
  --eval-every 3000 --name tri_cap_30k --lr 5e-4 \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_cap_30k.log 2>&1
echo CAP30K_EXIT=$?
echo QUEUE_AE_DONE
