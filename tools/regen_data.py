"""Regenerate the synthetic datasets the TPU queues consume (fresh container)."""
import sys
sys.path.insert(0, "/root/repo")
from nerf_kbs_tpu.data.synthetic_kitti import write_dataset, write_vkitti_dataset

write_dataset("/root/repo/outputs/kitti_syn", n_frames=40, h=375, w=1242)
print("kitti_syn written", flush=True)
write_vkitti_dataset("/root/repo/outputs/vkitti_syn")
print("vkitti_syn written", flush=True)
print("DONE", flush=True)
