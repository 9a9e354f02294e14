"""Streaming RGB-D + pose robot demo with live memory visualization.

ref: Detic/robot_demo.py. Pipeline reproduced TPU-first:
  * directory of timestamped RGB frames + depth maps + a pose log
  * nearest-timestamp depth/pose matching (robot_demo.py:491-496)
  * pinhole intrinsics (hard-coded RealSense defaults, :124-126)
  * 40m x 40m top-down map at 0.2 m cells = 200x200 (:470-476)
  * per frame: depth+pose -> world xyz -> flattened proj indices (:527-534),
    computed on device via geometry/projector.py instead of host torch
  * detector frame with persistent memory + map overlay render (:556-601)

Runs headless: writes annotated frames + the live semantic map to an output
directory (cv2 windows optional via --show).

Usage:
  python -m embodied_object_detection_tpu.demo.robot_demo \
      --data-dir <dir> --output out_demo [--zs-weight mp3d_clip.npy]
  <dir>/rgb/<t>.jpg|png, <dir>/depth/<t>.npy|png (mm), <dir>/poses.txt
  with lines: <t> x y z heading elevation
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Dict, List, Tuple

import numpy as np

# RealSense-style defaults (ref: robot_demo.py:124-126 hard-codes fx, fy, cx,
# cy for the 640x480 stream)
DEFAULT_VFOV_DEG = 58.0
MAP_SIZE_M = 40.0                 # ref: robot_demo.py:470-476
GRID_CELL_M = 0.2
MAP_CELLS = int(MAP_SIZE_M / GRID_CELL_M)   # 200
Z_CLIP_M = 0.5
DEPTH_SCALING = 1000.0            # depth stored in mm (ref: robot_demo.py depth/1000)


def _list_timestamped(directory: str) -> List[Tuple[float, str]]:
    out = []
    for f in sorted(os.listdir(directory)):
        stem = os.path.splitext(f)[0]
        try:
            out.append((float(stem), os.path.join(directory, f)))
        except ValueError:
            continue
    return out


def _nearest(items: List[Tuple[float, str]], t: float) -> str:
    """ref: robot_demo.py:491-496 nearest-timestamp matching."""
    return min(items, key=lambda x: abs(x[0] - t))[1]


def _load_depth(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import cv2
    return cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32)


def _load_poses(path: str) -> List[Tuple[float, np.ndarray]]:
    poses = []
    with open(path) as f:
        for line in f:
            vals = [float(x) for x in line.split()]
            if len(vals) >= 6:
                poses.append((vals[0], np.asarray(vals[1:6], np.float32)))
    return poses


def compute_proj_indices(depth_mm: np.ndarray, xyzhe: np.ndarray,
                         vfov_rad: float, map_cells: int = MAP_CELLS):
    """depth + pose -> flattened map indices + outlier mask (device-side).

    ref: robot_demo.py:491-534 (pixel_to_world_mapping + discretize +
    flatten), re-expressed with geometry/projector.py."""
    import jax.numpy as jnp
    from ..geometry import transform3d, pixel_to_world, world_to_map_indices

    T = transform3d(jnp.asarray(xyzhe)[None])[0]
    # recenter map on the trajectory origin: shift world so the map covers
    # [0, map_cells * GRID_CELL_M) around the start (ref keeps a fixed
    # world shift, :470-476); derived from map_cells — a hardcoded
    # MAP_SIZE_M/2 would push any non-default map size entirely outside
    # the grid (silent all-outlier memory)
    half = map_cells * GRID_CELL_M / 2.0
    shift = jnp.asarray([-half, 0.0, -half], jnp.float32)
    world = pixel_to_world(jnp.asarray(depth_mm), T, vfov_rad, shift,
                           depth_scaling=DEPTH_SCALING)
    camera_height = jnp.asarray(xyzhe[1])
    proj, outliers = world_to_map_indices(world, camera_height, GRID_CELL_M,
                                          map_cells, map_cells, Z_CLIP_M)
    # no-reading depth (0 mm on RealSense) projects to the camera's own
    # cell — mask it like the reference's no_depth mask (SMNet
    # point_cloud; build_data.py applies the same depth<=0 guard)
    outliers = outliers | (jnp.asarray(depth_mm) <= 0)
    return proj, outliers


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--output", default="out_demo")
    parser.add_argument("--zs-weight", default="",
                        help=".npy CLIP class embeddings (e.g. mp3d_clip.npy)")
    parser.add_argument("--checkpoint", default="",
                        help="orbax params checkpoint (optional)")
    parser.add_argument("--stride", type=int, default=2,
                        help="frame stride (ref: robot_demo.py:489)")
    parser.add_argument("--map-cells", type=int, default=MAP_CELLS,
                        help="top-down map side length in cells")
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="config overrides: section.field=value")
    args = parser.parse_args(argv)

    import dataclasses
    import cv2
    from ..config import DetectorConfig, apply_opts
    from .predictor import EmbodiedPredictor, load_zs_weight_npy

    map_cells = args.map_cells
    cfg = DetectorConfig()
    # demo knobs (ref: robot_demo.py:344-359 setup_cfg)
    cfg = cfg.replace(
        roi=dataclasses.replace(cfg.roi, one_class_per_proposal=True),
        memory=dataclasses.replace(cfg.memory,
                                   max_cells=map_cells * map_cells))
    cfg = apply_opts(cfg, args.opts)

    zs = load_zs_weight_npy(args.zs_weight) if args.zs_weight else None
    params = None
    if args.checkpoint:
        from ..engine.checkpoint import restore_checkpoint
        from ..models.detector import build_detector
        _, template = build_detector(cfg)
        params = restore_checkpoint(args.checkpoint, template)
    predictor = EmbodiedPredictor(cfg, params=params, zs_weight=zs)

    rgbs = _list_timestamped(os.path.join(args.data_dir, "rgb"))
    depths = _list_timestamped(os.path.join(args.data_dir, "depth"))
    poses = _load_poses(os.path.join(args.data_dir, "poses.txt"))
    os.makedirs(args.output, exist_ok=True)
    vfov = math.radians(DEFAULT_VFOV_DEG)

    import time
    for n, (t, rgb_path) in enumerate(rgbs[::args.stride]):
        t0 = time.perf_counter()
        image = cv2.cvtColor(cv2.imread(rgb_path), cv2.COLOR_BGR2RGB)
        depth = _load_depth(_nearest(depths, t))
        pose = min(poses, key=lambda x: abs(x[0] - t))[1]
        h, w = cfg.input.height, cfg.input.width
        if depth.shape != (h, w):
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)

        proj, outliers = compute_proj_indices(depth, pose, vfov, map_cells)
        dets = predictor(image, np.asarray(proj), np.asarray(outliers))

        overlay = predictor.render_detections(
            np.asarray(predictor._prep_image(image), np.uint8), dets)
        semmap = predictor.render_map(map_cells, map_cells, scale=2)
        cv2.imwrite(os.path.join(args.output, f"frame_{n:05d}.jpg"),
                    cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(args.output, f"map_{n:05d}.png"),
                    cv2.cvtColor(semmap, cv2.COLOR_RGB2BGR))
        print(f"frame {n} ({time.perf_counter() - t0:.3f}s) "
              f"dets={int(np.asarray(dets.valid).sum())}")
        if args.show:  # pragma: no cover
            cv2.imshow("detections", cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
            cv2.imshow("map", cv2.cvtColor(semmap, cv2.COLOR_RGB2BGR))
            cv2.waitKey(1)


if __name__ == "__main__":
    main()
