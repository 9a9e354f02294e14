"""Memory-data builder: sensor h5 -> memory h5 (proj indices + empty memory).

ref: Detic/SMNet/build_memory_data.py (157 LoC): reads the per-chunk sensor
h5 (per-pixel world xyz from build_data.py), downsamples the world grid
(0.02 m x 10 = 0.2 m cells, :84-86, 113-115), shifts by the scene's
map_world_shift, clips to the map, flattens indices y*W + x (:136-144), and
writes memory_features (zeros, :147) / proj_indices / semmap_gt (:150-153).

This version recomputes world xyz on device from depth + pose via
geometry/projector.py when raw projections are absent
(_world_xyz_from_sensor), so it also serves the robot pipeline; without a
map-info json it derives one grid per SCENE from the union of its chunks'
extents, never one per chunk. habitat-sim rendering itself (build_data.py)
stays an external host tool — see data/synthetic.py for a sim-free fixture
generator.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np


def world_to_proj_indices(world_xyz: np.ndarray, map_world_shift: np.ndarray,
                          resolution: float, map_w: int, map_h: int
                          ) -> np.ndarray:
    """[..., 3] world xyz -> [...] flattened map indices (y-up convention,
    map over (x, z); ref: build_memory_data.py:113-144)."""
    shifted = world_xyz - np.asarray(map_world_shift)
    x = np.round(shifted[..., 0] / resolution).astype(np.int64)
    z = np.round(shifted[..., 2] / resolution).astype(np.int64)
    x = np.clip(x, 0, map_w - 1)
    z = np.clip(z, 0, map_h - 1)
    return z * map_w + x


def _world_xyz_from_sensor(f, vfov_deg: float = 67.5) -> np.ndarray:
    """[T, H, W, 3] per-pixel world coordinates from one sensor h5.

    Prefers the precomputed `projection_indices` (build_data.py output);
    falls back to recomputing on device from depth + pose via
    geometry/projector.py (the robot pipeline's input shape,
    robot_demo.py:500-534)."""
    if "projection_indices" in f:
        return np.array(f["projection_indices"])
    if "depth" not in f:
        raise KeyError(
            "sensor h5 lacks projection_indices AND the depth/pose keys "
            "needed to recompute them")
    import jax.numpy as jnp
    from ..geometry.projector import (pixel_to_world, pose_to_xyzhe,
                                      transform3d)
    depth = np.array(f["depth"])                    # [T, H, W] meters
    # prefer the reference schema's sensor pose (quaternions); fall back
    # to the agent-pose keys (euler) — pose_to_xyzhe handles both dialects
    if "sensor_positions" in f:
        pos = np.array(f["sensor_positions"])
        rot = np.array(f["sensor_rotations"])
    elif all(k in f for k in ("positions", "orientations")):
        pos = np.array(f["positions"])
        rot = np.array(f["orientations"])
    else:
        raise KeyError("sensor h5 lacks pose keys "
                       "(sensor_positions/sensor_rotations or "
                       "positions/orientations)")
    vfov = math.radians(vfov_deg)
    shift = jnp.zeros((3,), jnp.float32)
    out = []
    for i in range(depth.shape[0]):
        cam2world = transform3d(
            jnp.asarray(pose_to_xyzhe(pos[i], rot[i])))[0]
        out.append(np.asarray(pixel_to_world(jnp.asarray(depth[i]),
                                             cam2world, vfov, shift)))
    return np.stack(out)


def build_memory_file(sensor_h5: str, out_h5: str,
                      map_world_shift: Optional[np.ndarray] = None,
                      resolution: float = 0.2,
                      map_dims: Optional[Tuple[int, int]] = None,
                      memory_dim: int = 512,
                      world: Optional[np.ndarray] = None) -> Tuple[int, int]:
    """Convert one sensor h5 (with `projection_indices` world coords, or
    depth+pose to recompute them) into the memory h5 schema. Returns
    (map_w, map_h).

    Preserved reference quirk: `masks_outliers` (invalid-depth pixels,
    which project to the camera position) is deliberately NOT consumed —
    build_memory_data.py:124 loads it and never uses it, and the runtime
    write path (custom_rcnn.py:903-936) uses the raw clipped indices, so
    outlier pixels write into the camera's map cell there too. The model
    accepts a real per-pixel mask (FrameInputs.outlier_mask) for
    non-parity deployments."""
    import h5py
    with h5py.File(sensor_h5, "r") as f:
        if world is None:
            world = _world_xyz_from_sensor(f)          # [T, H, W, 3]
        semmap_gt = np.array(f["segmentation_data"]) if "segmentation_data" in f \
            else None

    if map_world_shift is None:
        map_world_shift = world.reshape(-1, 3).min(axis=0)
    if map_dims is None:
        extent = world.reshape(-1, 3).max(axis=0) - np.asarray(map_world_shift)
        map_w = int(np.ceil(extent[0] / resolution)) + 1
        map_h = int(np.ceil(extent[2] / resolution)) + 1
    else:
        map_w, map_h = map_dims

    proj = world_to_proj_indices(world, map_world_shift, resolution,
                                 map_w, map_h)[..., None]

    if semmap_gt is not None and \
            np.asarray(semmap_gt).size != proj.size:
        semmap_gt = None  # mismatched sensor layout; no per-pixel mapping
    if semmap_gt is None:
        cell_gt = np.zeros((map_h * map_w,), np.int32)
    else:
        # per-pixel classes -> per-cell majority OBJECT class (the
        # reference writes the precomputed GT semantic map; a cell with
        # any object pixels takes the modal object class — void/negative
        # ids never outvote objects, and ids are compacted so arbitrary
        # instance-id ranges can't blow up the counts matrix)
        flat_proj = proj.reshape(-1)
        classes = np.asarray(semmap_gt).reshape(-1).astype(np.int64)
        obj = classes > 0
        uniq, inv = np.unique(classes[obj], return_inverse=True)
        cell_gt = np.zeros((map_h * map_w,), np.int32)
        if uniq.size:
            counts = np.zeros((map_h * map_w, uniq.size), np.int64)
            np.add.at(counts, (flat_proj[obj], inv), 1)
            has_obj = counts.sum(axis=1) > 0
            cell_gt[has_obj] = uniq[counts.argmax(axis=1)[has_obj]]

    os.makedirs(os.path.dirname(out_h5) or ".", exist_ok=True)
    with h5py.File(out_h5, "w") as f:
        # zero-initialized memory — the reference does the same
        # (build_memory_data.py:147); eval resets it anyway
        # (custom_rcnn.py:470-477)
        f.create_dataset("memory_features",
                         data=np.zeros((map_h * map_w, memory_dim), np.float16))
        f.create_dataset("proj_indices", data=proj.astype(np.int64))
        d = f.create_dataset("semmap_gt", data=cell_gt)
        # class-space marker: these ids are lvis-20+1 (0 = void), NOT the
        # reference's SMNet 13-class ids — the loader's map_gt baseline
        # must not row-remap them (episode_dataset.py semmap_dialect)
        d.attrs["class_space"] = "lvis21"
    return map_w, map_h


def map_shift_from_info(env: str, info: dict,
                        dataset: str = "mp3d") -> np.ndarray:
    """Per-scene map_world_shift from the dataset's map-info json.

    mp3d: semmap_GT_info.json carries an explicit `map_world_shift`
    (build_memory_data.py:128-131). replica: replica_map_info.json carries
    x/y extents, shift = [x_min-1, 0, y_min-1]
    (build_replica_memory_data.py:131).
    """
    entry = info[env]
    if dataset == "replica":
        return np.array([entry["x_min"] - 1.0, 0.0, entry["y_min"] - 1.0],
                        np.float64)
    return np.asarray(entry["map_world_shift"], np.float64)


def map_dims_from_info(env: str, info: dict, dataset: str,
                       resolution: float) -> Optional[Tuple[int, int]]:
    """Per-scene map dims so every chunk of a scene shares ONE grid.

    replica: from the x/y extents (+-1 margin like the shift,
    build_replica_memory_data.py:131). mp3d: semmap_GT_info `dim` is in
    0.02 m cells; the pipeline downsamples by resolution/0.02
    (custom_rcnn.py:362-364 `downsample = 10` at 0.2 m)."""
    entry = info[env]
    if dataset == "replica" and "x_max" in entry:
        # EXACT reference arithmetic (build_replica_memory_data.py:132-146):
        # dims in 0.02 m cells, then ONE ceil after the /downsample — a +1
        # or an extra ceil shifts every flat index with z >= 1 (flat =
        # z*map_w + x), silently desyncing from reference-built grids
        ds = resolution / 0.02
        w = math.ceil(((2 + entry["x_max"] - entry["x_min"]) / 0.02) / ds)
        h = math.ceil(((2 + entry["y_max"] - entry["y_min"]) / 0.02) / ds)
        return int(w), int(h)
    if "dim" in entry:
        ds = resolution / 0.02
        return (int(np.ceil(entry["dim"][0] / ds)),
                int(np.ceil(entry["dim"][2] / ds))
                if len(entry["dim"]) > 2 else
                int(np.ceil(entry["dim"][1] / ds)))
    return None


def _scene_of(filename: str, info: dict) -> Optional[str]:
    """Longest info key that prefixes the filename (scene ids themselves
    contain underscores: apartment_0, frl_apartment_1, ...)."""
    stem = filename[:-3] if filename.endswith(".h5") else filename
    best = None
    for k in info:
        if stem == k or stem.startswith(k + "_"):
            if best is None or len(k) > len(best):
                best = k
    return best


def _scene_stem(filename: str) -> str:
    """{scene}_{chunk}.h5 -> scene (trailing _<int> stripped; scene ids
    themselves contain underscores: apartment_0, frl_apartment_1, ...)."""
    stem = filename[:-3] if filename.endswith(".h5") else filename
    head, _, tail = stem.rpartition("_")
    return head if head and tail.isdigit() else stem


def build_dataset_memories(sensor_dir: str, out_dir: str,
                           map_info_json: Optional[str] = None,
                           dataset: str = "mp3d",
                           resolution: float = 0.2) -> dict:
    """Convert every sensor h5 under sensor_dir, resolving each scene's
    map shift AND dims from the dataset map-info json when given (the
    build_memory_data / build_replica_memory_data drivers), so all chunks
    of a scene share one grid. Without the json the same guarantee holds
    from the data itself: chunks are grouped by scene (trailing _<chunk>
    stripped) and a first pass unions their world extents — eval carries
    memory across a scene's chunks (episode_dataset resets only at chunk
    0), so per-chunk grids would silently mean different world positions.
    Returns {file: (map_w, map_h)}."""
    import json

    import h5py
    info = json.load(open(map_info_json)) if map_info_json else None
    files = [f for f in sorted(os.listdir(sensor_dir)) if f.endswith(".h5")]

    dims = {}
    if info is not None:
        for f in files:
            env = _scene_of(f, info)
            if env is None:
                raise ValueError(
                    f"{f}: no scene entry in {map_info_json} — a chunk "
                    f"built against a private grid would desync from its "
                    f"scene's carried memory")
            shift = map_shift_from_info(env, info, dataset)
            mdims = map_dims_from_info(env, info, dataset, resolution)
            dims[f] = build_memory_file(os.path.join(sensor_dir, f),
                                        os.path.join(out_dir, f),
                                        map_world_shift=shift,
                                        map_dims=mdims,
                                        resolution=resolution)
        return dims

    # No map-info json: one scene at a time — a first pass unions the
    # scene's world extents into one grid, a second pass writes its chunks.
    # Peak host memory is bounded by ONE scene, not the dataset: worlds are
    # cached between the passes only when they were genuinely recomputed
    # from depth+pose (device work worth saving); files carrying
    # precomputed `projection_indices` are just re-read from h5 (caching
    # those would hold every [T,H,W,3] float array of the run at once).
    by_scene: dict = {}
    for f in files:
        by_scene.setdefault(_scene_stem(f), []).append(f)
    for scene_files in by_scene.values():
        worlds: dict = {}
        lo = hi = None
        for f in scene_files:
            with h5py.File(os.path.join(sensor_dir, f), "r") as h:
                cheap = "projection_indices" in h
                world = _world_xyz_from_sensor(h)
            if not cheap:
                worlds[f] = world
            flat = world.reshape(-1, 3)
            lo = flat.min(axis=0) if lo is None \
                else np.minimum(lo, flat.min(axis=0))
            hi = flat.max(axis=0) if hi is None \
                else np.maximum(hi, flat.max(axis=0))
        extent = hi - lo
        mdims = (int(np.ceil(extent[0] / resolution)) + 1,
                 int(np.ceil(extent[2] / resolution)) + 1)
        for f in scene_files:
            dims[f] = build_memory_file(os.path.join(sensor_dir, f),
                                        os.path.join(out_dir, f),
                                        map_world_shift=lo,
                                        map_dims=mdims,
                                        resolution=resolution,
                                        world=worlds.pop(f, None))
    return dims


def main(argv=None):  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sensor-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--resolution", type=float, default=0.2)
    p.add_argument("--dataset", choices=["mp3d", "replica"], default="mp3d")
    p.add_argument("--map-info-json", default=None,
                   help="semmap_GT_info.json / replica_map_info.json")
    args = p.parse_args(argv)
    dims = build_dataset_memories(args.sensor_dir, args.out_dir,
                                  args.map_info_json, args.dataset,
                                  args.resolution)
    for f, d in dims.items():
        print(f, "->", d)


if __name__ == "__main__":  # pragma: no cover
    main()
