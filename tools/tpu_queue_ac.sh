#!/bin/bash
# Queue AC: tri_cap collapse diagnostics. The capacity-matched arm
# (max_res 128, hidden 256, 12 levels) collapses to constant renders with
# fresh batches (train~eval~17.4). One axis per arm: lower lr, longer
# coarse-to-fine window.
set -x
while kill -0 $(cat /tmp/queue_ab.pid) 2>/dev/null; do sleep 60; done
cd /root/repo
timeout 1800 python tools/study_field.py --field fourier --steps 9000 \
  --eval-every 1500 --name tri_cap_lr5e4 --lr 5e-4 \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_cap_lr5e4.log 2>&1
echo CAP_LR_EXIT=$?
timeout 1800 python tools/study_field.py --field fourier --steps 9000 \
  --eval-every 1500 --name tri_cap_anneal6k \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=6000 stop_grad_sampling=true \
  > /tmp/tri_cap_anneal6k.log 2>&1
echo CAP_ANNEAL_EXIT=$?
echo QUEUE_AC_DONE
