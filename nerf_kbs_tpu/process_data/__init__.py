"""Offline preprocessing pipeline (the reference's process_data/): monocular
depth + ego pose, rigid flow vs optical flow -> motion masks, instance-mask
fusion, video inpainting, COLMAP ingestion, transforms.json / metadata.json
generation. Compute-heavy pieces are JAX/XLA ops."""
