#!/bin/bash
# Queue AA: re-run every study invalidated by the single-frozen-batch bug
# (next_train(0) in the study tools' sample_round; fixed in dc138e9).
# Order: cheap/decisive camera-opt arms first, then the field A/B arms,
# hash arm (~83 min) last.
set -x
cd /root/repo

# 1. camera-opt: landscape probe (conventions + basin + grad direction)
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --arms probe \
  --out outputs/camopt_study/probe.json fourier_anneal_steps=1000 \
  > /tmp/camopt_probe2.log 2>&1
echo PROBE_EXIT=$?

# 2. camera-opt: clean / off / opt (the headline functional arms)
timeout 5400 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --arms clean,off,opt \
  --out outputs/camopt_study/result_annealed.json fourier_anneal_steps=1000 \
  > /tmp/camopt_arms2.log 2>&1
echo ARMS_EXIT=$?

# 3. camera-opt: frozen-field camera-only recovery
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 500 \
  --frozen-steps 3000 --arms frozen \
  --out outputs/camopt_study/frozen.json fourier_anneal_steps=1000 \
  > /tmp/camopt_frozen2.log 2>&1
echo FROZEN_EXIT=$?

# 4. field A/B: tri flagship arm @1800 (fast)
timeout 1800 python tools/study_field.py --field fourier --steps 1800 \
  --eval-every 300 --name tri_ab \
  max_res=64 base_res=4 hidden_dim=128 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_ab2.log 2>&1
echo TRI_AB_EXIT=$?

# 5. field A/B: tri flagship wall-clock arm @30k (fast)
timeout 1800 python tools/study_field.py --field fourier --steps 30000 \
  --eval-every 3000 --name tri_30k \
  max_res=64 base_res=4 hidden_dim=128 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_30k2.log 2>&1
echo TRI_30K_EXIT=$?

# 6. capacity-matched tri arm @30k — the PARITY "honest negative"
#    (max_res 128 memorizes) may have been an artifact of the frozen batch
timeout 3600 python tools/study_field.py --field fourier --steps 30000 \
  --eval-every 3000 --name tri_cap \
  max_res=128 base_res=4 hidden_dim=256 fourier_num_levels=12 num_layers=3 \
  'num_proposal_samples_per_ray=[128,48]' fourier_basis=tri \
  fourier_anneal_steps=1500 stop_grad_sampling=true \
  > /tmp/tri_cap2.log 2>&1
echo TRI_CAP_EXIT=$?

# 7. field A/B: full reference hash config @1800 (~83 min)
timeout 7200 python tools/study_field.py --field hash --steps 1800 \
  --eval-every 300 --name hash_ab \
  > /tmp/hash_ab2.log 2>&1
echo HASH_AB_EXIT=$?
echo QUEUE_AA_DONE
