"""Regenerate the synthetic datasets the TPU queues consume (fresh container)."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
from nerf_kbs_tpu.data.synthetic_kitti import (
    write_dataset,
    write_dynamic_dataset,
    write_vkitti_dataset,
)

write_dataset(REPO / "outputs/kitti_syn", n_frames=40, h=375, w=1242)
print("kitti_syn written", flush=True)
write_vkitti_dataset(REPO / "outputs/vkitti_syn")
print("vkitti_syn written", flush=True)
write_dynamic_dataset(REPO / "outputs/kitti_dyn")
print("kitti_dyn written", flush=True)
print("DONE", flush=True)
