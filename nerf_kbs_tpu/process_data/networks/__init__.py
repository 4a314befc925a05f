"""Perception networks for the preprocessing chain (flax/linen, NHWC):
monodepth2 (ResNet encoder + depth/pose decoders), RAFT optical flow, and the
video-inpainting generator. Weight loaders port public torch checkpoints
(torch is CPU-only in this image and used solely for .pth deserialization).
"""
