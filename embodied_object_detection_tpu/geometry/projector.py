"""Pinhole geometry / egocentric->allocentric projection (pure jnp).

TPU-native re-expression of the reference projector stack
(ref: Detic/SMNet/projector/core.py:6-271, projector.py:66-106,
point_cloud.py:8-56, plus the inline copy in robot_demo.py:92-321).
All functions are pure, shape-static and jit/vmap-friendly — there is no
Projector class holding cached tensors; XLA CSEs the constant pixel grids.

Coordinate conventions follow the reference (Habitat/MP3D): y-axis is up,
the top-down map discretizes world (x, z).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def transform3d(xyzhe: jax.Array) -> jax.Array:
    """(N,5) [x,y,z,heading,elevation] -> (N,4,4) camera-to-world matrices.

    ref: SMNet/projector/core.py:6-34 (_transform3D). Rotation = R_y(heading)
    @ R_x(elevation) with the reference's exact sign conventions.
    """
    x, y, z, heading, elevation = (xyzhe[:, i] for i in range(5))
    cx, sx = jnp.cos(elevation), jnp.sin(elevation)
    cy, sy = jnp.cos(heading), jnp.sin(heading)
    zeros = jnp.zeros_like(cx)
    ones = jnp.ones_like(cx)
    rows = [
        jnp.stack([cy, sx * sy, cx * sy, x], axis=-1),
        jnp.stack([zeros, cx, -sx, y], axis=-1),
        jnp.stack([-sy, cy * sx, cy * cx, z], axis=-1),
        jnp.stack([zeros, zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def pose_to_xyzhe(position, rotation) -> "np.ndarray":
    """(position [3], rotation) -> [1, 5] xyzhe row for transform3d.

    rotation dialects (ONE shared definition for build_data/build_memory):
      * quaternion [x, y, z, w] — the reference's habitat convention:
        rotvec -> (elevation, heading, bank), and xyzhe takes
        `elevation + pi` ("in Habitat y is up", SMNet build_data.py:186-194)
      * euler [elevation, heading, bank] — the synthetic renderer's
        dialect: heading = rot[1], elevation = rot[0], no offset
    """
    import numpy as np
    rotation = np.asarray(rotation, np.float64).reshape(-1)
    if rotation.shape[0] == 4:
        from scipy.spatial.transform import Rotation as R
        elevation, heading, _bank = R.from_quat(rotation).as_rotvec()
        elevation = elevation + math.pi
    else:
        heading, elevation = float(rotation[1]), float(rotation[0])
    p = np.asarray(position, np.float64).reshape(3)
    return np.asarray([[p[0], p[1], p[2], heading, elevation]], np.float32)


def intrinsic_matrix(width: int, height: int, vfov: float) -> jnp.ndarray:
    """Pinhole K from vertical field of view (radians).

    ref: core.py:68-77 (compute_intrinsic_matrix) — note the reference derives
    hfov = width/height * vfov (small-angle aspect scaling), preserved here.
    """
    hfov = width / height * vfov
    f_x = width / (2.0 * math.tan(hfov / 2.0))
    f_y = height / (2.0 * math.tan(vfov / 2.0))
    return jnp.array([[f_x, 0.0, width / 2.0],
                      [0.0, f_y, height / 2.0],
                      [0.0, 0.0, 1.0]], jnp.float32)


def pixel_scales(width: int, height: int, vfov: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (x_scale, y_scale) = ((u+0.5-cx)/fx, (v+0.5-cy)/fy), each [H, W].

    ref: core.py:80-114 (compute_scaling_params); the +0.5 projects through
    pixel centers.
    """
    K = intrinsic_matrix(width, height, vfov)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = jnp.arange(width, dtype=jnp.float32)[None, :]
    v = jnp.arange(height, dtype=jnp.float32)[:, None]
    x_scale = (jnp.broadcast_to(u, (height, width)) + 0.5 - cx) / fx
    y_scale = (jnp.broadcast_to(v, (height, width)) + 0.5 - cy) / fy
    return x_scale, y_scale


def depth_to_point_cloud(depth: jax.Array, vfov: float,
                         depth_scaling: float = 1.0) -> jax.Array:
    """[H, W] (or [B, H, W]) depth -> [..., H, W, 4] homogeneous camera-frame xyz1.

    ref: core.py:116-149 (point_cloud): z = d/scale, x = z*x_scale, y = z*y_scale.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    x_scale, y_scale = pixel_scales(w, h, vfov)
    z = depth / depth_scaling
    x = z * x_scale
    y = z * y_scale
    return jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)


def camera_to_world(xyz1: jax.Array, T: jax.Array) -> jax.Array:
    """[..., 4] points through [4, 4] camera-to-world transform.

    ref: core.py:151-175 (transform_camera_to_world, a bmm) — expressed as a
    single einsum so XLA maps it onto the MXU for whole frames at once.
    fp32-forced: the reference bmm is fp32 torch; at bf16 matmul precision
    (~2^-8 rel) a 40 m world coordinate carries ~0.15 m error — more than
    the 0.1 m half-cell of the 0.2 m grid, so discretize_point_cloud would
    round boundary pixels into the wrong map cell.
    """
    return jnp.einsum("ij,...j->...i", T, xyz1,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def pixel_to_world(depth: jax.Array, T: jax.Array, vfov: float,
                   world_shift_origin: jax.Array,
                   depth_scaling: float = 1.0) -> jax.Array:
    """[H, W] depth + pose -> [H, W, 3] world xyz (origin-shifted).

    ref: core.py:177-225 (pixel_to_world_mapping).
    """
    xyz1 = depth_to_point_cloud(depth, vfov, depth_scaling)
    world = camera_to_world(xyz1, T)[..., :3]
    return world - world_shift_origin


def discretize_point_cloud(point_cloud: jax.Array, camera_height: jax.Array,
                           gridcellsize: float, map_height: int, map_width: int,
                           z_clip_threshold: float) -> Tuple[jax.Array, jax.Array]:
    """World xyz -> integer top-down map (x, z) cells + outlier mask.

    ref: core.py:227-271 (discretize_point_cloud). Outliers = outside the map
    or above camera_y + z_clip (y is up in MP3D). Returns
    (pixels_in_map [..., 2] int32 as (x, z), mask_outliers [...] bool).
    """
    xz = jnp.round(point_cloud[..., jnp.array([0, 2])] / gridcellsize)
    outside = ((xz[..., 0] >= map_width) | (xz[..., 1] >= map_height) |
               (xz[..., 0] < 0) | (xz[..., 1] < 0))
    above = point_cloud[..., 1] > (camera_height + z_clip_threshold)
    return xz.astype(jnp.int32), outside | above


def world_to_map_indices(point_cloud: jax.Array, camera_height: jax.Array,
                         gridcellsize: float, map_height: int, map_width: int,
                         z_clip_threshold: float) -> Tuple[jax.Array, jax.Array]:
    """Flattened per-pixel map indices idx = z*W + x (the `proj_indices` format
    consumed by memory read/write; ref: SMNet/build_memory_data.py:136-144 and
    robot_demo.py:527-534). Outlier pixels map to cell 0 with mask=True."""
    xz, outliers = discretize_point_cloud(
        point_cloud, camera_height, gridcellsize, map_height, map_width,
        z_clip_threshold)
    x = jnp.clip(xz[..., 0], 0, map_width - 1)
    z = jnp.clip(xz[..., 1], 0, map_height - 1)
    flat = z * map_width + x
    return jnp.where(outliers, 0, flat).astype(jnp.int32), outliers
