"""Sensor-data generation: render agent trajectories into the h5 episode
format the loader consumes (the build_data.py analog).

ref: Detic/SMNet/build_data.py:56-292 — drives a habitat-sim renderer over
precomputed agent paths (paths.json), renders rgb / depth / semantic /
GT boxes per frame, projects depth to per-pixel world xyz + outlier masks,
and writes one h5 per 20-frame sample with keys rgb / depth /
sensor_positions / sensor_rotations (quaternions) / projection_indices /
masks_outliers / detection_data (stringified dicts) / segmentation_data
(:220-286). This builder writes those keys plus agent-pose
positions/orientations for its own fallback reader.

The renderer is a pluggable host-side interface (`Renderer`): habitat-sim is
external C++ outside this environment (SURVEY §7.8), so the default backend
is the synthetic scene renderer (data/synthetic.py); a habitat-backed
implementation only needs the four render methods. Geometry (depth -> world
xyz, outliers) is the jax projector — the same code the runtime uses.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Protocol, Sequence, Tuple

import numpy as np


class Renderer(Protocol):
    """The HabitatUtils surface the build script needs
    (ref: SMNet/utils/habitat_utils.py:14-284)."""

    def set_agent_state(self, position: np.ndarray, rotation: np.ndarray
                        ) -> None: ...
    def render_rgb(self) -> np.ndarray: ...            # [H, W, 3] uint8
    def render_depth(self) -> np.ndarray: ...          # [H, W] float meters
    def render_semantic(self) -> np.ndarray: ...       # [H, W] int class+1
    def render_boxes(self) -> List[dict]: ...          # per-instance dicts


def detection_record_str(file_name: str, boxes_xyxy: Sequence[Sequence[float]],
                         classes: Sequence[int]) -> str:
    """The stringified-dict GT record the loader parses back
    (ref: build_data.py:230 detection_data vlen str; loader.py:255-267 —
    gt_boxes are stored xywh)."""
    xywh = [[float(b[0]), float(b[1]),
             float(b[2] - b[0]), float(b[3] - b[1])] for b in boxes_xyxy]
    return str({"file_name": file_name, "image": 0,
                "gt_boxes": xywh, "gt_classes": [int(c) for c in classes]})


def _default_jpeg_dir(out_h5: str) -> str:
    """JPEGImages dir for a sensor h5: sibling of sensor_data/ when the h5
    lives there (the EpisodeDataset / mp3d_example layout), else next to
    the h5."""
    d = os.path.dirname(os.path.abspath(out_h5))
    root = os.path.dirname(d) if os.path.basename(d) == "sensor_data" else d
    return os.path.join(root, "JPEGImages")


def build_sample_h5(renderer: Renderer, positions: np.ndarray,
                    rotations: np.ndarray, out_h5: str,
                    vfov_deg: float = 67.5,
                    min_box_edge: int = 15,
                    jpeg_dir: "Optional[str]" = None) -> dict:
    """Render one multi-frame sample and write the sensor h5 + the
    per-frame JPEGs its detection records reference (the reference keeps
    the JPEGs; CocoDetectionDataset opens them unconditionally).

    positions [T, 3], rotations [T, 3] euler or [T, 4] quaternion xyzw
    (agent states along the path — the reference's paths.json carries
    quaternions; see geometry.projector.pose_to_xyzhe for the dialects).
    The projection uses the SENSOR pose when the renderer exposes
    get_sensor_pos/get_sensor_ori (the reference does, SMNet
    build_data.py:179-190 — the sensor sits ~1.25 m above the agent),
    else the agent pose. Depth is scaled by `renderer.depth_scale` for
    projection (habitat depth buffers are [0,1]-normalized over
    MAX_DEPTH=10, so the reference multiplies by 10.0, :205-206) while the
    h5 'depth' key stores the raw render like the reference schema.
    GT boxes below `min_box_edge` px are dropped (habitat_utils.py:12, 273).
    jpeg_dir defaults to the dataset's JPEGImages/ (see _default_jpeg_dir);
    pass jpeg_dir="" to skip writing images. Returns summary stats."""
    import math

    import h5py
    import jax.numpy as jnp
    from ..geometry.projector import (pixel_to_world, pose_to_xyzhe,
                                      transform3d)

    vfov = math.radians(vfov_deg)
    depth_scale = float(getattr(renderer, "depth_scale", 1.0))
    t = len(positions)
    rgb_all, depth_all, xyz_all, outlier_all = [], [], [], []
    sensor_pos_all, sensor_rot_all = [], []
    det_strs, seg_all = [], []
    for i in range(t):
        renderer.set_agent_state(positions[i], rotations[i])
        rgb = renderer.render_rgb()
        depth = renderer.render_depth()
        # camera-to-world from the SENSOR pose when available
        # (ref: build_data.py:179-194 via _transform3D)
        if hasattr(renderer, "get_sensor_pos"):
            s_pos = np.asarray(renderer.get_sensor_pos(), np.float64)
            s_rot = np.asarray(renderer.get_sensor_ori(), np.float64)
        else:
            s_pos = np.asarray(positions[i], np.float64)
            s_rot = np.asarray(rotations[i], np.float64)
        sensor_pos_all.append(s_pos)
        sensor_rot_all.append(s_rot)
        cam2world = transform3d(jnp.asarray(pose_to_xyzhe(s_pos, s_rot)))[0]
        world = pixel_to_world(
            jnp.asarray(np.asarray(depth, np.float32) * depth_scale),
            cam2world, vfov, jnp.zeros((3,), jnp.float32))
        # invalid-depth pixels are the outliers at this stage
        # (ref: projector/point_cloud.py:8-56 no_depth mask)
        outliers = np.asarray(depth) <= 0.0
        boxes_recs = renderer.render_boxes()
        boxes, classes = [], []
        for r in boxes_recs:
            x1, y1, x2, y2 = r["box"]
            if min(x2 - x1, y2 - y1) >= min_box_edge:
                boxes.append([x1, y1, x2, y2])
                classes.append(r["id"])
        rgb_all.append(rgb)
        depth_all.append(depth)
        xyz_all.append(np.asarray(world))
        outlier_all.append(outliers)
        base = os.path.splitext(os.path.basename(out_h5))[0]
        det_strs.append(detection_record_str(f"{base}_{i}.jpg", boxes,
                                             classes))
        seg_all.append(renderer.render_semantic())

    os.makedirs(os.path.dirname(out_h5) or ".", exist_ok=True)
    if jpeg_dir is None:
        jpeg_dir = _default_jpeg_dir(out_h5)
    if jpeg_dir:
        from PIL import Image
        os.makedirs(jpeg_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(out_h5))[0]
        for i, rgb in enumerate(rgb_all):
            Image.fromarray(np.asarray(rgb, np.uint8)).save(
                os.path.join(jpeg_dir, f"{base}_{i}.jpg"), quality=90)
    with h5py.File(out_h5, "w") as f:
        f.create_dataset("rgb", data=np.stack(rgb_all).astype(np.uint8))
        f.create_dataset("depth", data=np.stack(depth_all).astype(np.float32))
        # reference schema keys (build_memory_data.py:125 reads
        # sensor_positions; its try/except silently SKIPS files without
        # them) — the SENSOR pose actually used for the projection
        f.create_dataset("sensor_positions",
                         data=np.asarray(sensor_pos_all, np.float32))
        f.create_dataset("sensor_rotations",
                         data=np.asarray(sensor_rot_all, np.float32))
        # agent pose (our fallback-reader keys, kept for compatibility)
        f.create_dataset("positions", data=np.asarray(positions, np.float32))
        f.create_dataset("orientations",
                         data=np.asarray(rotations, np.float32))
        f.create_dataset("projection_indices",
                         data=np.stack(xyz_all).astype(np.float32))
        f.create_dataset("masks_outliers",
                         data=np.stack(outlier_all).astype(bool))
        f.create_dataset("detection_data", data=np.asarray(det_strs, object),
                         dtype=h5py.special_dtype(vlen=str))
        f.create_dataset("segmentation_data",
                         data=np.stack(seg_all).astype(np.int32))
    return dict(frames=t, path=out_h5)


def build_env_samples(renderer: Renderer, env: str, path: Dict[str, list],
                      output_dir: str, nb_samples: int = 50,
                      nb_frames: int = 20, seed: int = 0,
                      random_starts: bool = False, **kw) -> List[str]:
    """Slice `nb_samples` `nb_frames`-windows from an env's path and render
    each. Default: deterministic evenly-spaced starts (reproducible
    fixtures). random_starts=True draws seeded uniform starts — the
    reference's original sampling (build_data.py:139-141 randint, later
    frozen into an info json)."""
    positions = np.asarray(path["positions"], np.float32)
    rotations = np.asarray(path["orientations"], np.float32)
    n = len(positions)
    assert n >= nb_frames, (env, n)
    if random_starts:
        starts = np.random.RandomState(seed).randint(
            0, n - nb_frames + 1, size=nb_samples)
    else:
        starts = np.linspace(0, n - nb_frames, num=min(nb_samples,
                                                       n - nb_frames + 1),
                             dtype=int)
    out = []
    for m, start in enumerate(starts):
        fn = os.path.join(output_dir, f"{env}_{m}.h5")
        build_sample_h5(renderer, positions[start: start + nb_frames],
                        rotations[start: start + nb_frames], fn, **kw)
        out.append(fn)
    return out


def main(argv: Optional[list] = None):  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--paths-json", required=True,
                   help="env -> {positions, orientations} trajectories")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--renderer", default="synthetic",
                   choices=["synthetic", "habitat"],
                   help="'habitat' drives habitat-sim (external C++; needs "
                        "habitat-api installed) through "
                        "data.habitat_renderer; 'synthetic' needs nothing")
    p.add_argument("--scene-data-path", default="",
                   help="Matterport root for --renderer habitat; scenes "
                        "resolve to <root>/habitat_data/v1/tasks/mp3d/"
                        "<house>/<house>.glb like the reference "
                        "(SMNet/build_data.py:132)")
    p.add_argument("--samples-per-env", type=int, default=50)
    p.add_argument("--frames-per-sample", type=int, default=20)
    args = p.parse_args(argv)
    with open(args.paths_json) as f:
        paths = json.load(f)
    for env, path in paths.items():
        if args.renderer == "habitat":
            from .habitat_renderer import HabitatRenderer
            # env names are '<house>_<level>' (envs_splits.json); the scene
            # .glb is per-house (ref: build_data.py:128-133)
            house = env.rsplit("_", 1)[0]
            scene = os.path.join(args.scene_data_path, "habitat_data", "v1",
                                 "tasks", "mp3d", house, house + ".glb")
            renderer = HabitatRenderer(scene)
        else:
            import zlib
            from .synthetic import SyntheticRenderer
            renderer = SyntheticRenderer(
                seed=zlib.crc32(env.encode()) % (2 ** 31))
        try:
            files = build_env_samples(renderer, env, path, args.output_dir,
                                      args.samples_per_env,
                                      args.frames_per_sample)
        finally:
            getattr(renderer, "close", lambda: None)()
        print(f"{env}: {len(files)} samples")


if __name__ == "__main__":  # pragma: no cover
    main()
