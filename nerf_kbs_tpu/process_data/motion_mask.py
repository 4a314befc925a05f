"""Motion-mask extraction ops: moving probability from optical-vs-rigid flow,
hard thresholding, instance-mask fusion, disparity post-processing, depth
conversion, panoptic->dynamic-class masks, and mask rendering.

Capability parity with the reference driver and utils
(/root/reference/process_data/motion_mask.py, motion_mask_util.py):
- moving probability = min-max-normalized (|flow_opt| - |flow_rigid|) on
  per-max-normalized flows (motion_mask.py:50-62);
- hard mask at th_r (= 0.3, motion_mask.py:462-467,522);
- fusion with instance masks: whole object marked dynamic when its moving
  ratio exceeds m_th (= 0.6), else pixel-wise AND
  (motion_mask_util.py:163-184 semantic_flow_combine2);
- cosine flow distance (motion_mask_util.py:126-137);
- monodepth flip post-process (motion_mask_util.py:189-197) and
  disp_to_depth with camera-specific metric scaling x5.37 KITTI / x0.747 TUM
  and clamp [1e-3, 80] (motion_mask.py:315-344);
- KITTI-STEP panoptic -> binary dynamic-class mask, categories
  13, 14, 15, 16, 18 (motion_mask_util.py:225-270);
- disk-erosion of instance masks (motion_mask_util.py:337-392);
- mask overlay rendering (motion_mask.py:64-95).

Array ops are jnp where differentiability/scale matters; small morphological
host utilities use numpy/cv2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# KITTI-STEP semantic category ids considered dynamic (car, truck, bus,
# person, bicycle; reference motion_mask_util.py:225-270)
DYNAMIC_CATEGORIES = (13, 14, 15, 16, 18)

KITTI_STEREO_SCALE = 5.37  # metric scaling presets (reference x5.37 kitti,
TUM_STEREO_SCALE = 0.747  # x0.747 tum, motion_mask.py:335-340)


def moving_probability(optical_flow: jnp.ndarray, rigid_flow: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel probability of non-rigid motion in [0, 1].

    optical_flow / rigid_flow: (2, H, W). Each flow is normalized by its own
    max magnitude, then the difference of their L2 norms is min-max
    normalized (reference cal_opt_cam_flow_res, motion_mask.py:50-62).
    """
    o = optical_flow / jnp.maximum(jnp.abs(optical_flow).max(), 1e-12)
    r = rigid_flow / jnp.maximum(jnp.abs(rigid_flow).max(), 1e-12)
    no = jnp.linalg.norm(o, axis=0)
    nr = jnp.linalg.norm(r, axis=0)
    d = no - nr
    return (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-12)


def cosine_flow_distance(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(1 - cos_sim)/2 between flow fields (2, H, W) -> (H, W) in [0, 1]
    (reference np_cosine_distance, motion_mask_util.py:126-137)."""
    na = a / (jnp.linalg.norm(a, axis=0) + eps)
    nb = b / (jnp.linalg.norm(b, axis=0) + eps)
    return (1.0 - jnp.sum(na * nb, axis=0)) / 2.0


def hard_motion_mask(moving_prob: jnp.ndarray, threshold: float = 0.3) -> jnp.ndarray:
    """Binary mask: 1 = moving (reference th_r default 0.3,
    motion_mask.py:462-467,522)."""
    return (moving_prob > threshold).astype(jnp.uint8)


def fuse_instance_motion_mask(
    instance_mask: np.ndarray, motion_mask: np.ndarray, m_th: float = 0.6
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse a (possibly soft, 1 = background) instance mask with a binary
    motion mask: if the object region's moving ratio exceeds m_th the whole
    object is dynamic, otherwise only object-pixels that are also moving
    (reference semantic_flow_combine2, motion_mask_util.py:163-184).

    Returns (final_mask 1=dynamic, object_mask 1=object). Resizes the
    instance mask to the motion mask's shape with nearest neighbor if needed.
    """
    ins = (np.asarray(instance_mask) > 0.5).astype(np.uint8)
    ins = 1 - ins  # reference convention: input 1 = background
    motion = np.asarray(motion_mask).astype(np.float32)
    if ins.shape != motion.shape:
        from scipy.ndimage import zoom

        ins = zoom(
            ins, (motion.shape[0] / ins.shape[0], motion.shape[1] / ins.shape[1]), order=0
        )
    denom = max(float(ins.sum()), 1e-12)
    mov_ratio = float((motion * ins).sum()) / denom
    if mov_ratio > m_th:
        final = ins.astype(np.uint8)
    else:
        final = (ins * motion).astype(np.uint8)
    return final, ins


def per_object_fusion(
    instance_labels: np.ndarray, motion_mask: np.ndarray, m_th: float = 0.6
) -> np.ndarray:
    """Variant operating on integer instance-id maps: each object id fused
    independently (reference semantic_flow_combine, motion_mask_util.py:139-160).
    Returns mask with 1 = STATIC (the reference returns 1 - final)."""
    final = np.zeros_like(motion_mask, dtype=np.uint8)
    motion = motion_mask.astype(np.float32)
    for n in np.unique(instance_labels):
        if n <= 0:
            continue
        obj = (instance_labels == n).astype(np.float32)
        ratio = float((motion * obj).sum()) / max(float(obj.sum()), 1e-12)
        if ratio > m_th:
            final |= obj.astype(np.uint8)
        else:
            final |= (obj * motion).astype(np.uint8)
    return 1 - final


def instances_from_components(
    mask: np.ndarray, min_area: int = 64, close_size: int = 7
) -> np.ndarray:
    """Weight-free instance extraction: connected components of a binary mask
    after morphological closing, small blobs dropped. Returns an int32
    instance-label map (0 = background).

    This is the self-contained stand-in for the reference's Mask R-CNN
    instance masks (motion_mask_util.py:337-392): when no segmentation
    network output is available, motion blobs themselves are treated as
    objects so per-object fusion (per_object_fusion) still applies — the
    pipeline runs end-to-end from raw video with zero external inputs.
    Precomputed instance masks / panoptic annotations take priority when
    provided (as the reference also accepts, motion_mask.py:240,473-475).
    """
    from scipy import ndimage

    m = np.asarray(mask) > 0
    if close_size > 1:
        st = np.ones((close_size, close_size), bool)
        m = ndimage.binary_closing(m, structure=st)
    labels, n = ndimage.label(m)
    out = np.zeros_like(labels, dtype=np.int32)
    nxt = 1
    for i in range(1, n + 1):
        blob = labels == i
        if blob.sum() >= min_area:
            out[blob] = nxt
            nxt += 1
    return out


def post_process_disparity(l_disp: jnp.ndarray, r_disp: jnp.ndarray) -> jnp.ndarray:
    """Monodepth v1 flip-fusion of disparities predicted on the image and its
    horizontal flip. l_disp/r_disp: (B, H, W)
    (reference batch_post_process_disparity, motion_mask_util.py:189-197)."""
    b, h, w = l_disp.shape
    m = 0.5 * (l_disp + r_disp)
    l = jnp.linspace(0, 1, w)[None, None, :]
    l_mask = 1.0 - jnp.clip(20 * (l - 0.05), 0, 1)
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m


def disp_to_depth(
    disp: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Monodepth2 sigmoid-disparity -> (scaled disp, depth): disp in [0, 1]
    maps linearly to [1/max_depth, 1/min_depth]; depth = 1/scaled."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled = min_disp + (max_disp - min_disp) * disp
    return scaled, 1.0 / scaled


def metric_depth(depth: jnp.ndarray, camera: str = "kitti") -> jnp.ndarray:
    """Apply the camera-specific metric scale + clamp [1e-3, 80]
    (reference motion_mask.py:335-344)."""
    scale = {"kitti": KITTI_STEREO_SCALE, "tum": TUM_STEREO_SCALE}.get(camera, 1.0)
    return jnp.clip(depth * scale, 1e-3, 80.0)


def panoptic_to_dynamic_mask(
    panoptic: np.ndarray, categories: tuple[int, ...] = DYNAMIC_CATEGORIES
) -> np.ndarray:
    """KITTI-STEP panoptic annotation (R channel = semantic category id) ->
    binary mask of dynamic-class pixels (1 = dynamic class)
    (reference annotation_to_panoptical, motion_mask_util.py:225-270)."""
    sem = panoptic[..., 0] if panoptic.ndim == 3 else panoptic
    return np.isin(sem, categories).astype(np.uint8)


def erode_mask(mask: np.ndarray, radius: int = 10) -> np.ndarray:
    """Disk erosion (the reference erodes Mask R-CNN instances with a
    radius-10 disk, motion_mask_util.py:380-388)."""
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    return cv2.erode(mask.astype(np.uint8), kernel)


def dilate_mask(mask: np.ndarray, size: int = 10, iterations: int = 4) -> np.ndarray:
    """Cross-kernel dilation (the inpainting step dilates masks with a 10x10
    cross, 4 iters; reference inpaint.py:42-45)."""
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_CROSS, (size, size))
    return cv2.dilate(mask.astype(np.uint8), kernel, iterations=iterations)


def render_mask_on_image(
    image: np.ndarray,
    mask: np.ndarray,
    color: tuple[int, int, int] = (255, 255, 255),
    mask_weight: float = 0.7,
) -> np.ndarray:
    """Alpha-blend a colored mask over an image (reference
    render_mask_on_image, motion_mask.py:64-95)."""
    out = image.astype(np.float32).copy()
    m = mask > 0
    overlay = np.array(color, np.float32)
    out[m] = out[m] * (1 - mask_weight) + overlay * mask_weight
    return out.astype(np.uint8)
