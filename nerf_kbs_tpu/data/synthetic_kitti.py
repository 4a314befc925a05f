"""KITTI-scale synthetic street scene, written to disk in the KITTI layout.

Purpose: the reference's operating point is 30k steps on 375x1242 KITTI
sequences (reference train.py:49,61-62). No real KITTI data exists in this
environment, so this module generates an analytic street scene — textured
ground plane, building facades, parked cars, sky — rendered with exact ray
tracing at full KITTI resolution, and writes the exact on-disk layout the
KITTI dataparser consumes (data/dataparsers/kitti.py):

    out_dir/calib.txt               P2 projection (KITTI odometry calib)
    out_dir/<seq>.txt               cam0 poses, 3x4 rows (KITTI odometry)
    out_dir/<seq>/000000.png        left-color frames
    out_dir/depth/000000.npy        z-depth in meters (float32)
    out_dir/sem/000000.png          semantic class-index maps
    out_dir/mask/000000.png         static-scene validity masks (all white)
    out_dir/semantics_list.txt      Category,R,G,B CSV

The scene is static (no transients) so PSNR measures pure reconstruction
quality; textures are deliberately high-frequency (lane markings, facade
windows) so PSNR is not trivially saturated by low-frequency fits.

All geometry is axis-aligned in the KITTI cam0 convention: x right, y DOWN,
z forward; the ground plane is y = +CAM_HEIGHT.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

CAM_HEIGHT = 1.65  # meters above ground (KITTI camera mount)

# KITTI odometry cam2 intrinsics (sequence 00 scale)
FX = 718.856
FY = 718.856
CX = 607.1928
CY = 185.2157


@dataclasses.dataclass(frozen=True)
class Box:
    lo: np.ndarray  # (3,) min corner, cam0 world axes
    hi: np.ndarray  # (3,) max corner
    kind: str  # "building" | "car"
    base_color: np.ndarray  # (3,)


SEMANTIC_CLASSES = ["road", "building", "car", "sky"]
SEMANTIC_COLORS = np.array(
    [[128, 64, 128], [70, 70, 70], [0, 0, 142], [70, 130, 180]], np.uint8
)


def make_scene(seed: int = 0, length: float = 120.0) -> list[Box]:
    """Buildings lining a straight road plus parked cars."""
    rng = np.random.default_rng(seed)
    boxes: list[Box] = []
    for side in (-1.0, 1.0):
        z = 0.0
        while z < length:
            depth = rng.uniform(8.0, 16.0)
            height = rng.uniform(6.0, 14.0)
            x0 = side * rng.uniform(7.0, 9.0)
            width = rng.uniform(3.0, 6.0)
            lo = np.array(
                [min(x0, x0 + side * width), CAM_HEIGHT - height, z], np.float64
            )
            hi = np.array(
                [max(x0, x0 + side * width), CAM_HEIGHT, z + depth], np.float64
            )
            col = rng.uniform(0.35, 0.75, 3)
            boxes.append(Box(lo, hi, "building", col))
            z += depth + rng.uniform(0.0, 3.0)
    # parked cars: low boxes at the road edges
    for i in range(10):
        side = -1.0 if i % 2 == 0 else 1.0
        z = 6.0 + 11.0 * i
        x0 = side * 5.2
        lo = np.array([min(x0, x0 + side * 1.8), CAM_HEIGHT - 1.5, z], np.float64)
        hi = np.array([max(x0, x0 + side * 1.8), CAM_HEIGHT, z + 4.2], np.float64)
        col = np.array(
            [[0.7, 0.1, 0.1], [0.1, 0.2, 0.7], [0.8, 0.8, 0.8], [0.1, 0.5, 0.2],
             [0.9, 0.6, 0.1]][i % 5],
            np.float64,
        )
        boxes.append(Box(lo, hi, "car", col))
    return boxes


def make_poses(n_frames: int, step: float = 0.8) -> np.ndarray:
    """(N, 3, 4) cam0->world poses: forward along +z with gentle lateral sway
    and yaw, like a driving sequence."""
    poses = []
    for i in range(n_frames):
        z = step * i
        x = 0.35 * np.sin(0.05 * z)
        yaw = 0.018 * np.cos(0.05 * z)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        t = np.array([x, 0.0, z])
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    return np.stack(poses)


# ---------------------------------------------------------------------------
# procedural textures (vectorized over flat point arrays)
# ---------------------------------------------------------------------------


def _road_color(p: np.ndarray) -> np.ndarray:
    """Asphalt with dashed center line + solid edge lines + coarse mottling."""
    x, z = p[:, 0], p[:, 2]
    base = 0.22 + 0.05 * np.sin(2.1 * x) * np.sin(1.7 * z) + 0.03 * np.sin(
        7.3 * x + 3.1 * z
    )
    col = np.stack([base, base, base], axis=1)
    dash = (np.abs(x) < 0.12) & (np.mod(z, 6.0) < 3.0)
    edge = (np.abs(np.abs(x) - 4.6) < 0.12)
    col[dash] = [0.85, 0.85, 0.75]
    col[edge] = [0.8, 0.8, 0.8]
    # sidewalk strip beyond the edge lines
    walk = np.abs(x) > 4.9
    g = 0.45 + 0.08 * np.sin(3.0 * x[walk]) * np.sin(3.0 * z[walk])
    col[walk] = np.stack([g, g, g * 0.95], axis=1)
    return col


def _building_color(p: np.ndarray, box: Box) -> np.ndarray:
    """Facade with window grid: dark rectangles on the base color."""
    y, z = p[:, 1], p[:, 2]
    u = z - box.lo[2]
    v = box.hi[1] - y  # height above ground
    win = (np.mod(u, 2.4) < 1.4) & (np.mod(v, 2.8) > 1.1) & (
        np.mod(v, 2.8) < 2.3
    ) & (v > 0.8)
    col = np.broadcast_to(box.base_color, (p.shape[0], 3)).copy()
    shade = 0.75 + 0.25 * np.sin(1.3 * u) * np.sin(0.9 * v)
    col *= shade[:, None]
    col[win] = [0.08, 0.1, 0.14]
    return col


def _car_color(p: np.ndarray, box: Box) -> np.ndarray:
    y = p[:, 1]
    col = np.broadcast_to(box.base_color, (p.shape[0], 3)).copy()
    v = box.hi[1] - y
    col[v > 0.9] = [0.15, 0.16, 0.2]  # window band
    col[v < 0.25] *= 0.4  # skirt
    return col


def _sky_color(d: np.ndarray) -> np.ndarray:
    """Gradient by elevation (-y up)."""
    up = np.clip(-d[:, 1], 0.0, 1.0)
    top = np.array([0.35, 0.55, 0.85])
    hor = np.array([0.78, 0.84, 0.9])
    return hor[None, :] + (top - hor)[None, :] * up[:, None] ** 0.7


# ---------------------------------------------------------------------------
# exact ray tracing
# ---------------------------------------------------------------------------


def trace(origins: np.ndarray, dirs: np.ndarray, boxes: list[Box],
          return_ids: bool = False):
    """Nearest-hit trace. origins/dirs (N, 3) in cam0 world axes (y down).
    Returns rgb (N, 3), distance along the (unit) ray (N,), semantic ids
    (N,) — plus hit box indices (N,) int32 (-1 ground, -2 sky) when
    ``return_ids``."""
    n = origins.shape[0]
    best_t = np.full(n, np.inf)
    rgb = _sky_color(dirs)
    sem = np.full(n, SEMANTIC_CLASSES.index("sky"), np.int32)
    ids = np.full(n, -2, np.int32)

    # ground plane y = CAM_HEIGHT
    dy = dirs[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_pl = (CAM_HEIGHT - origins[:, 1]) / dy
    hit = (dy > 1e-9) & (t_pl > 1e-6)
    if hit.any():
        p = origins[hit] + dirs[hit] * t_pl[hit, None]
        best_t[hit] = t_pl[hit]
        rgb[hit] = _road_color(p)
        sem[hit] = SEMANTIC_CLASSES.index("road")
        ids[hit] = -1

    inv = np.where(np.abs(dirs) > 1e-12, 1.0 / dirs, np.inf)
    for bi, box in enumerate(boxes):
        t0 = (box.lo[None, :] - origins) * inv
        t1 = (box.hi[None, :] - origins) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax > np.maximum(tmin, 1e-6)) & (tmin < best_t) & (tmin > 1e-6)
        if not hit.any():
            continue
        p = origins[hit] + dirs[hit] * tmin[hit, None]
        best_t[hit] = tmin[hit]
        ids[hit] = bi
        if box.kind == "building":
            rgb[hit] = _building_color(p, box)
            sem[hit] = SEMANTIC_CLASSES.index("building")
        else:
            rgb[hit] = _car_color(p, box)
            sem[hit] = SEMANTIC_CLASSES.index("car")

    depth = np.where(np.isfinite(best_t), best_t, 0.0)
    # simple distance haze so far geometry stays learnable-smooth
    haze = np.clip(depth / 160.0, 0.0, 0.55)[:, None]
    sky_mask = sem == SEMANTIC_CLASSES.index("sky")
    rgb = np.where(sky_mask[:, None], rgb, rgb * (1 - haze) + haze * 0.8)
    rgb = np.clip(rgb, 0.0, 1.0)
    if return_ids:
        return rgb, depth, sem, ids
    return rgb, depth, sem


def _pixel_rays(pose: np.ndarray, h: int, w: int, fx: float, fy: float,
                cx: float, cy: float):
    """Full-image pixel-grid rays for a (3, 4) cam0->world pose: returns
    (origins (HW, 3), unit world dirs (HW, 3), |d_cam| norms (HW, 1),
    pixel xs (HW,), pixel ys (HW,)). The single source of the unprojection
    convention — render_frame/render_flow and the dynamic variants all use
    it, so a convention change cannot desynchronize flow from rgb/depth."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    d_cam = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1
    ).reshape(-1, 3)
    d_world = d_cam @ pose[:3, :3].T
    norm = np.linalg.norm(d_world, axis=1, keepdims=True)
    o = np.broadcast_to(pose[:3, 3], d_world.shape)
    return o, d_world / norm, norm, xs.reshape(-1), ys.reshape(-1)


def _project_into(pose_b: np.ndarray, pts: np.ndarray, fx: float, fy: float,
                  cx: float, cy: float):
    """Project world points into a (3, 4) cam0->world frame b (x right,
    y down, z forward): returns (u (N,), v (N,), z (N,))."""
    rel = pts - pose_b[:3, 3]
    cam_b = rel @ pose_b[:3, :3]  # == R_b^T @ rel, rowwise
    z = cam_b[:, 2]
    zs = np.where(np.abs(z) < 1e-6, 1e-6, z)
    return fx * cam_b[:, 0] / zs + cx, fy * cam_b[:, 1] / zs + cy, z


def render_frame(pose: np.ndarray, boxes: list[Box], h: int, w: int,
                 fx: float = FX, fy: float = FY,
                 cx: float | None = None, cy: float | None = None):
    """Render one frame. pose (3, 4) cam0->world. Returns (rgb, depth, sem)."""
    cx = CX * w / 1242.0 if cx is None else cx
    cy = CY * h / 375.0 if cy is None else cy
    o, dirs, norm, _, _ = _pixel_rays(pose, h, w, fx, fy, cx, cy)
    rgb, t_ray, sem = trace(o, dirs, boxes)
    # d_cam has z-component 1, so camera z-depth = t_along_unit_dir / |d_cam|
    zdepth = t_ray / norm[:, 0]
    return (
        rgb.reshape(h, w, 3),
        zdepth.reshape(h, w).astype(np.float32),
        sem.reshape(h, w).astype(np.int32),
    )


def render_flow(pose_a: np.ndarray, pose_b: np.ndarray, boxes: list[Box],
                h: int, w: int, fx: float, fy: float, cx: float, cy: float):
    """Exact forward optical flow from frame a to frame b (static scene,
    camera motion only): trace frame a, reproject each hit point into frame
    b. Returns (flow (H, W, 2) float32, valid (H, W) bool — hit pixels whose
    reprojection lands in front of camera b). Sky pixels are invalid (their
    flow is rotation-only / infinite-depth; rendered depth there is
    undefined, so supervising them would fight the model)."""
    o, dirs, norm, xs_f, ys_f = _pixel_rays(pose_a, h, w, fx, fy, cx, cy)
    _, t_ray, sem = trace(o, dirs, boxes)
    hit = sem != SEMANTIC_CLASSES.index("sky")
    pts = o + dirs * t_ray[:, None]
    u1, v1, z = _project_into(pose_b, pts, fx, fy, cx, cy)
    valid = hit & (z > 0.1)
    flow = np.stack([u1 - xs_f, v1 - ys_f], -1)
    flow = np.where(valid[:, None], flow, 0.0)
    return (
        flow.reshape(h, w, 2).astype(np.float32),
        valid.reshape(h, w),
    )


def write_dataset(out_dir: str | Path, n_frames: int = 40, h: int = 375,
                  w: int = 1242, seed: int = 0, fx: float | None = None,
                  fy: float | None = None, step: float = 0.8,
                  write_flow: bool = False) -> Path:
    """Generate and write the full KITTI-layout dataset. Returns out_dir.
    With write_flow, also writes exact forward flow t -> t+1 as
    flow_fwd/%06d.npy (H, W, 3: u, v, valid) — the format ImageMetadata's
    flow loader consumes."""
    from PIL import Image

    out = Path(out_dir)
    seq = "00"
    (out / seq).mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(exist_ok=True)
    (out / "sem").mkdir(exist_ok=True)
    (out / "mask").mkdir(exist_ok=True)

    sx = w / 1242.0
    sy = h / 375.0
    fx = FX * sx if fx is None else fx
    fy = FY * sy if fy is None else fy
    cx = CX * sx
    cy = CY * sy

    # calib.txt: P2 row (KITTI odometry format)
    p2 = np.zeros((3, 4))
    p2[0, 0], p2[1, 1], p2[0, 2], p2[1, 2], p2[2, 2] = fx, fy, cx, cy, 1.0
    lines = []
    for name in ("P0", "P1", "P2", "P3"):
        lines.append(name + ": " + " ".join(f"{v:.12e}" for v in p2.reshape(-1)))
    (out / "calib.txt").write_text("\n".join(lines) + "\n")

    boxes = make_scene(seed=seed, length=n_frames * step + 90.0)
    poses = make_poses(n_frames, step=step)
    with open(out / f"{seq}.txt", "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.12e}" for v in p.reshape(-1)) + "\n")

    for i, pose in enumerate(poses):
        rgb, depth, sem = render_frame(pose, boxes, h, w, fx, fy, cx, cy)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            out / seq / f"{i:06}.png"
        )
        np.save(out / "depth" / f"{i:06}.npy", depth)
        # semantic maps are COLOR images (the datamanager maps colors back to
        # class ids by nearest palette color, as the reference does for
        # KITTI-STEP annotations)
        Image.fromarray(SEMANTIC_COLORS[sem]).save(out / "sem" / f"{i:06}.png")
        Image.fromarray(np.full((h, w), 255, np.uint8), mode="L").save(
            out / "mask" / f"{i:06}.png"
        )
        if write_flow and i + 1 < len(poses):
            (out / "flow_fwd").mkdir(exist_ok=True)
            flow, valid = render_flow(
                pose, poses[i + 1], boxes, h, w, fx, fy, cx, cy
            )
            np.save(
                out / "flow_fwd" / f"{i:06}.npy",
                np.concatenate([flow, valid[..., None].astype(np.float32)], -1),
            )

    rows = ["Category,R,G,B"] + [
        f"{c},{r},{g},{b}"
        for c, (r, g, b) in zip(SEMANTIC_CLASSES, SEMANTIC_COLORS)
    ]
    (out / "semantics_list.txt").write_text("\n".join(rows) + "\n")
    return out


# ---------------------------------------------------------------------------
# dynamic scene: moving objects (exact flow + ground-truth motion masks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Mover:
    """A box translating at constant velocity (per-frame displacement)."""

    box: Box
    velocity: np.ndarray  # (3,) meters per frame, cam0 world axes


def make_movers() -> list[Mover]:
    """Two dynamic cars: one crossing the road left->right, one oncoming."""
    crossing = Box(
        lo=np.array([-6.5, CAM_HEIGHT - 1.6, 19.0]),
        hi=np.array([-2.5, CAM_HEIGHT, 21.0]),
        kind="car",
        base_color=np.array([0.85, 0.2, 0.1]),
    )
    oncoming = Box(
        lo=np.array([-3.4, CAM_HEIGHT - 1.5, 42.0]),
        hi=np.array([-1.6, CAM_HEIGHT, 46.2]),
        kind="car",
        base_color=np.array([0.1, 0.3, 0.8]),
    )
    return [
        Mover(crossing, np.array([0.9, 0.0, 0.0])),
        Mover(oncoming, np.array([0.0, 0.0, -1.6])),
    ]


def _displaced(m: Mover, frame: float) -> Box:
    d = m.velocity * frame
    return Box(m.box.lo + d, m.box.hi + d, m.box.kind, m.box.base_color)


def boxes_at(static: list[Box], movers: list[Mover], frame: float) -> list[Box]:
    """Scene boxes at a given frame time: movers FIRST so their trace box
    indices are 0..len(movers)-1 (used for motion-mask ground truth)."""
    return [_displaced(m, frame) for m in movers] + list(static)


def render_dynamic_frame(pose, static, movers, frame, h, w, fx, fy, cx, cy,
                         return_instances: bool = False):
    """Like render_frame but with movers at their frame-time positions.
    Returns (rgb, zdepth, sem, dyn_mask) — dyn_mask True on moving objects.
    With ``return_instances``, appends an int32 per-pixel instance-id map
    (0 = background, 1..n_movers = the moving objects) — free ground-truth
    labels for training the instance segmenter."""
    boxes = boxes_at(static, movers, frame)
    o, dirs, norm, _, _ = _pixel_rays(pose, h, w, fx, fy, cx, cy)
    rgb, t_ray, sem, ids = trace(o, dirs, boxes, return_ids=True)
    dyn = (ids >= 0) & (ids < len(movers))
    out = (
        rgb.reshape(h, w, 3),
        (t_ray / norm[:, 0]).reshape(h, w).astype(np.float32),
        sem.reshape(h, w).astype(np.int32),
        dyn.reshape(h, w),
    )
    if return_instances:
        inst = np.where(dyn, ids + 1, 0).astype(np.int32)
        return out + (inst.reshape(h, w),)
    return out


def render_dynamic_flow(pose_a, pose_b, static, movers, frame_a, frame_b,
                        h, w, fx, fy, cx, cy):
    """Exact forward optical flow for the DYNAMIC scene: hit points on a
    mover travel with it between frames before reprojection. Returns
    (flow (H, W, 2), valid (H, W) bool, dyn_mask (H, W) bool)."""
    boxes = boxes_at(static, movers, frame_a)
    o, dirs, norm, xs_f, ys_f = _pixel_rays(pose_a, h, w, fx, fy, cx, cy)
    _, t_ray, sem, ids = trace(o, dirs, boxes, return_ids=True)
    hit = sem != SEMANTIC_CLASSES.index("sky")
    pts = o + dirs * t_ray[:, None]
    # points on movers travel with their object
    dt = frame_b - frame_a
    for mi, m in enumerate(movers):
        on = ids == mi
        if on.any():
            pts[on] += m.velocity * dt
    u1, v1, z = _project_into(pose_b, pts, fx, fy, cx, cy)
    valid = hit & (z > 0.1)
    flow = np.stack([u1 - xs_f, v1 - ys_f], -1)
    flow = np.where(valid[:, None], flow, 0.0)
    dyn = (ids >= 0) & (ids < len(movers))
    return (
        flow.reshape(h, w, 2).astype(np.float32),
        valid.reshape(h, w),
        dyn.reshape(h, w),
    )


def write_dynamic_dataset(out_dir: str | Path, n_frames: int = 24,
                          h: int = 188, w: int = 621, seed: int = 0,
                          step: float = 0.8) -> Path:
    """KITTI-layout dataset of the DYNAMIC scene (moving cars): frames,
    z-depth, color semantics, and GT STATIC-validity masks (255 = static;
    the mask convention the trainers consume — dynamic pixels excluded from
    supervision). Flow is written like write_dataset."""
    from PIL import Image

    out = Path(out_dir)
    seq = "00"
    for d in (seq, "depth", "sem", "mask", "flow_fwd"):
        (out / d).mkdir(parents=True, exist_ok=True)

    sx, sy = w / 1242.0, h / 375.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    p2 = np.zeros((3, 4))
    p2[0, 0], p2[1, 1], p2[0, 2], p2[1, 2], p2[2, 2] = fx, fy, cx, cy, 1.0
    lines = [
        name + ": " + " ".join(f"{v:.12e}" for v in p2.reshape(-1))
        for name in ("P0", "P1", "P2", "P3")
    ]
    (out / "calib.txt").write_text("\n".join(lines) + "\n")

    static = make_scene(seed=seed, length=n_frames * step + 90.0)
    movers = make_movers()
    poses = make_poses(n_frames, step=step)
    with open(out / f"{seq}.txt", "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.12e}" for v in p.reshape(-1)) + "\n")

    for i, pose in enumerate(poses):
        rgb, depth, sem, dyn = render_dynamic_frame(
            pose, static, movers, i, h, w, fx, fy, cx, cy
        )
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            out / seq / f"{i:06}.png"
        )
        np.save(out / "depth" / f"{i:06}.npy", depth)
        Image.fromarray(SEMANTIC_COLORS[sem]).save(out / "sem" / f"{i:06}.png")
        Image.fromarray(((~dyn) * 255).astype(np.uint8), mode="L").save(
            out / "mask" / f"{i:06}.png"
        )
        if i + 1 < len(poses):
            flow, valid, _ = render_dynamic_flow(
                pose, poses[i + 1], static, movers, i, i + 1,
                h, w, fx, fy, cx, cy,
            )
            np.save(
                out / "flow_fwd" / f"{i:06}.npy",
                np.concatenate([flow, valid[..., None].astype(np.float32)], -1),
            )

    rows = ["Category,R,G,B"] + [
        f"{c},{r},{g},{b}"
        for c, (r, g, b) in zip(SEMANTIC_CLASSES, SEMANTIC_COLORS)
    ]
    (out / "semantics_list.txt").write_text("\n".join(rows) + "\n")
    return out


def write_vkitti_dataset(out_dir: str | Path, n_frames: int = 20,
                         h: int = 188, w: int = 621, seed: int = 0,
                         step: float = 0.8) -> Path:
    """Write the street scene in the Virtual KITTI 2 layout the vkitti
    dataparser consumes (data/dataparsers/vkitti.py): intrinsic.txt /
    extrinsic.txt tables, frames/rgb/Camera_0/rgb_%05d.jpg, 16-bit
    centimeter depth pngs. Exercises the vanilla-nerf entry point
    (train_nerf.py) end-to-end without real vKITTI data."""
    from PIL import Image

    out = Path(out_dir)
    (out / "frames" / "rgb" / "Camera_0").mkdir(parents=True, exist_ok=True)
    (out / "frames" / "depth" / "Camera_0").mkdir(parents=True, exist_ok=True)

    sx, sy = w / 1242.0, h / 375.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    boxes = make_scene(seed=seed, length=n_frames * step + 90.0)
    poses = make_poses(n_frames, step=step)

    intr_rows = ["frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]"]
    extr_rows = [
        "frame cameraID r1,1 r1,2 r1,3 t1 r2,1 r2,2 r2,3 t2 "
        "r3,1 r3,2 r3,3 t3 0 0 0 1"
    ]
    for i, pose in enumerate(poses):
        rgb, depth, _ = render_frame(pose, boxes, h, w, fx, fy, cx, cy)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            out / "frames" / "rgb" / "Camera_0" / f"rgb_{i:05d}.jpg", quality=97
        )
        cm16 = np.clip(depth * 100.0, 0, 65535).astype(np.uint16)
        Image.fromarray(cm16).save(  # uint16 array -> I;16 PNG (bit-exact)
            out / "frames" / "depth" / "Camera_0" / f"depth_{i:05d}.png"
        )
        intr_rows.append(f"{i} 0 {fx:.6f} {fy:.6f} {cx:.6f} {cy:.6f}")
        P4 = np.eye(4)
        P4[:3] = pose
        w2c = np.linalg.inv(P4)
        extr_rows.append(
            f"{i} 0 " + " ".join(f"{v:.9e}" for v in w2c.reshape(-1))
        )
    (out / "intrinsic.txt").write_text("\n".join(intr_rows) + "\n")
    (out / "extrinsic.txt").write_text("\n".join(extr_rows) + "\n")
    return out
