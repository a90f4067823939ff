"""Training datasets: camera rigs + target images.

The reference app hard-codes a single camera pose (app/main.cpp:188-207,
acknowledged in its README as a known limitation) and has no training, so
this module is new capability:

  * ``turntable_cameras`` / ``sphere_cameras`` — synthetic camera rigs.
  * ``SyntheticMultiView`` — renders ground-truth targets from a known
    scene with this framework's own renderer (self-supervised fit tests,
    benchmarking, demos).
  * ``load_nerf_synthetic`` — the NeRF-blender ``transforms*.json``
    format used by the reference's lego/chair release scenes.
  * ``load_colmap_text`` — COLMAP text-model cameras (images.txt /
    cameras.txt) used by the mip-NeRF-360 scenes (bicycle/garden).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import List, Optional

import numpy as np

from ..utils.camera import Camera, look_at_camera


def turntable_cameras(
    n: int,
    target=(0.0, 0.0, 0.0),
    radius: float = 4.0,
    elevation_deg: float = 20.0,
    world_up=(0.0, 0.0, 1.0),
    fov: float = 60.0,
    width: int = 512,
    height: int = 512,
) -> List[Camera]:
    """n cameras on a circle looking at `target` (orbit/turntable rig)."""
    cams = []
    el = math.radians(elevation_deg)
    for i in range(n):
        az = 2.0 * math.pi * i / n
        pos = (
            target[0] + radius * math.cos(az) * math.cos(el),
            target[1] + radius * math.sin(az) * math.cos(el),
            target[2] + radius * math.sin(el),
        )
        cams.append(
            look_at_camera(pos, target, world_up, fov=fov, width=width, height=height)
        )
    return cams


def sphere_cameras(
    n: int,
    target=(0.0, 0.0, 0.0),
    radius: float = 4.0,
    world_up=(0.0, 0.0, 1.0),
    fov: float = 60.0,
    width: int = 512,
    height: int = 512,
    seed: int = 0,
) -> List[Camera]:
    """n cameras quasi-uniform on the upper sphere (fibonacci spiral)."""
    cams = []
    golden = math.pi * (3.0 - math.sqrt(5.0))
    for i in range(n):
        z = (i + 0.5) / n  # upper hemisphere only
        r = math.sqrt(max(0.0, 1.0 - z * z))
        az = golden * i
        pos = (
            target[0] + radius * r * math.cos(az),
            target[1] + radius * r * math.sin(az),
            target[2] + radius * z,
        )
        cams.append(
            look_at_camera(pos, target, world_up, fov=fov, width=width, height=height)
        )
    return cams


@dataclasses.dataclass
class MultiViewDataset:
    """Cameras + (3, H, W) float32 target images in [0, 1]."""

    cameras: List[Camera]
    targets: List[np.ndarray]
    scene_extent: float = 1.0  # world radius (densification size threshold)

    def __len__(self):
        return len(self.cameras)


def synthetic_multiview(
    scene,
    n_views: int = 16,
    width: int = 256,
    height: int = 256,
    radius: float = 4.0,
    fov: float = 60.0,
    cfg=None,
    rig: str = "sphere",
    sh_degree: int = 3,
) -> MultiViewDataset:
    """Render ground-truth targets from `scene` with our own renderer."""
    import jax

    from ..config import RenderConfig
    from ..ops.render import render_view

    cfg = cfg or RenderConfig(max_pairs=1_000_000)
    make = sphere_cameras if rig == "sphere" else turntable_cameras
    cams = make(n_views, radius=radius, fov=fov, width=width, height=height)
    # one compile for every view: the camera is a traced CameraView
    fn = jax.jit(
        lambda view, *a: render_view(
            *a, view, width, height, cfg=cfg, sh_degree=sh_degree
        )[0]
    )
    targets = [
        np.asarray(fn(cam.to_view(), *scene.render_args())) for cam in cams
    ]
    extent = float(np.linalg.norm(np.asarray(scene.means), axis=1).max())
    return MultiViewDataset(cams, targets, scene_extent=max(extent, 1e-6))


def _camera_from_c2w(c2w: np.ndarray, fov_y_deg: float, width: int, height: int) -> Camera:
    """Camera from a 4x4 camera-to-world (OpenGL/NeRF convention:
    camera looks along -z, +y up)."""
    pos = c2w[:3, 3]
    front = -c2w[:3, 2]
    up = c2w[:3, 1]
    right = np.cross(front, up)
    return Camera(
        position=tuple(float(x) for x in pos),
        front=tuple(float(x) for x in front / np.linalg.norm(front)),
        up=tuple(float(x) for x in up / np.linalg.norm(up)),
        right=tuple(float(x) for x in right / np.linalg.norm(right)),
        fov=fov_y_deg,
        width=width,
        height=height,
    )


def load_nerf_synthetic(
    root: str,
    split: str = "train",
    white_background: bool = False,
    max_views: Optional[int] = None,
) -> MultiViewDataset:
    """NeRF-blender dataset: <root>/transforms_<split>.json + PNGs."""
    from PIL import Image

    path = os.path.join(root, f"transforms_{split}.json")
    with open(path) as f:
        meta = json.load(f)
    cameras, targets = [], []
    frames = meta["frames"][:max_views] if max_views else meta["frames"]
    for frame in frames:
        img_path = os.path.join(root, frame["file_path"] + ".png")
        if not os.path.exists(img_path):
            img_path = os.path.join(root, frame["file_path"])
        im = np.asarray(Image.open(img_path), np.float32) / 255.0
        h, w = im.shape[:2]
        if im.shape[-1] == 4:  # alpha-composite onto the background
            rgb, a = im[..., :3], im[..., 3:4]
            bg = 1.0 if white_background else 0.0
            im = rgb * a + bg * (1.0 - a)
        fov_y = math.degrees(
            2.0 * math.atan(math.tan(0.5 * meta["camera_angle_x"]) * h / w)
        )
        c2w = np.asarray(frame["transform_matrix"], np.float64)
        cameras.append(_camera_from_c2w(c2w, fov_y, w, h))
        # PIL rows are top-down; the renderer emits bottom-up rows (render_cli
        # and the reference app/main.cpp:322-337 both flip at PNG-write).
        # Flip targets so the training loss compares matching orientations.
        targets.append(np.transpose(im[::-1, :, :3], (2, 0, 1)).astype(np.float32))
    positions = np.stack([np.asarray(c.position) for c in cameras])
    center = positions.mean(axis=0)
    extent = float(np.linalg.norm(positions - center, axis=1).max()) * 1.1
    return MultiViewDataset(cameras, targets, scene_extent=max(extent, 1e-6))


def _qvec2rot(q: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def load_colmap_text(
    root: str,
    images_dir: str = "images",
    max_views: Optional[int] = None,
    downscale: int = 1,
) -> MultiViewDataset:
    """COLMAP text model: <root>/sparse/0/{cameras.txt,images.txt}.

    COLMAP convention: world->cam rotation qvec, translation tvec;
    camera looks along +z, +y down. Converted to our Camera (front/up).
    """
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(root, "sparse")
    cams_meta = {}
    with open(os.path.join(sparse, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model, w, h = int(parts[0]), parts[1], int(parts[2]), int(parts[3])
            p = [float(x) for x in parts[4:]]
            if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
                fx = fy = p[0]
            elif model in ("PINHOLE", "OPENCV", "FULL_OPENCV"):
                fx, fy = p[0], p[1]
            else:
                raise ValueError(f"unsupported COLMAP camera model {model}")
            cams_meta[cam_id] = (w, h, fx, fy)

    cameras, targets, centers = [], [], []
    with open(os.path.join(sparse, "images.txt")) as f:
        lines = [
            ln
            for ln in f
            if not ln.startswith("#") and ln.strip()
        ]
    # images.txt alternates: meta line, 2D-points line
    for meta_line in lines[0::2]:
        parts = meta_line.split()
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        w, h, fx, fy = cams_meta[cam_id]
        r_w2c = _qvec2rot(qvec)
        pos = -r_w2c.T @ tvec
        front = r_w2c.T @ np.array([0.0, 0.0, 1.0])  # +z forward
        up = r_w2c.T @ np.array([0.0, -1.0, 0.0])  # COLMAP y is down
        right = np.cross(front, up)
        fov_y = math.degrees(2.0 * math.atan(0.5 * h / fy))
        img_path = os.path.join(root, images_dir, name)
        im = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        if downscale > 1:
            im = im[::downscale, ::downscale]
        h, w = im.shape[0], im.shape[1]
        cameras.append(
            Camera(
                position=tuple(pos),
                front=tuple(front / np.linalg.norm(front)),
                up=tuple(up / np.linalg.norm(up)),
                right=tuple(right / np.linalg.norm(right)),
                fov=fov_y,
                width=int(w),
                height=int(h),
            )
        )
        # top-down PIL rows -> bottom-up render rows (see load_nerf_synthetic)
        targets.append(np.transpose(im[::-1], (2, 0, 1)).astype(np.float32))
        centers.append(pos)
        if max_views and len(cameras) >= max_views:
            break
    positions = np.stack(centers)
    center = positions.mean(axis=0)
    extent = float(np.linalg.norm(positions - center, axis=1).max()) * 1.1
    return MultiViewDataset(cameras, targets, scene_extent=max(extent, 1e-6))
