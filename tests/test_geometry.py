"""Geometry parity tests: jnp projector vs an independent numpy oracle
re-deriving the reference math (SMNet/projector/core.py)."""

import math

import jax.numpy as jnp
import numpy as np

from embodied_object_detection_tpu.geometry import (
    transform3d, intrinsic_matrix, depth_to_point_cloud, pixel_to_world,
    world_to_map_indices)


def np_transform3d(xyzhe):
    out = np.zeros((xyzhe.shape[0], 4, 4))
    for i, (x, y, z, h, e) in enumerate(xyzhe):
        cx, sx = math.cos(e), math.sin(e)
        cy, sy = math.cos(h), math.sin(h)
        out[i] = [[cy, sx * sy, cx * sy, x],
                  [0, cx, -sx, y],
                  [-sy, cy * sx, cy * cx, z],
                  [0, 0, 0, 1]]
    return out


def test_transform3d_matches_oracle(rng):
    xyzhe = rng.randn(5, 5).astype(np.float32)
    got = np.asarray(transform3d(jnp.asarray(xyzhe)))
    np.testing.assert_allclose(got, np_transform3d(xyzhe), atol=1e-5)


def test_transform3d_is_rigid(rng):
    xyzhe = rng.randn(3, 5).astype(np.float32)
    T = np.asarray(transform3d(jnp.asarray(xyzhe)))
    R = T[:, :3, :3]
    eye = np.eye(3)[None].repeat(3, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)


def test_intrinsics_center_pixel():
    vfov = math.radians(67.5)
    K = np.asarray(intrinsic_matrix(640, 480, vfov))
    assert K[0, 2] == 320 and K[1, 2] == 240
    # fy from vfov: h / (2 tan(vfov/2))
    assert abs(K[1, 1] - 480 / (2 * math.tan(vfov / 2))) < 1e-3


def test_depth_to_pointcloud_center_ray():
    vfov = math.radians(67.5)
    depth = jnp.full((480, 640), 2.0)
    xyz1 = np.asarray(depth_to_point_cloud(depth, vfov))
    # center pixels should have x,y ~ 0, z = depth
    center = xyz1[239:241, 319:321]
    assert np.all(np.abs(center[..., 0]) < 0.02)
    assert np.all(np.abs(center[..., 1]) < 0.02)
    np.testing.assert_allclose(center[..., 2], 2.0)
    np.testing.assert_allclose(center[..., 3], 1.0)


def test_pixel_to_world_identity_pose():
    vfov = math.radians(90.0)
    depth = jnp.full((8, 8), 1.0)
    T = jnp.eye(4)
    world = np.asarray(pixel_to_world(depth, T, vfov, jnp.zeros(3)))
    assert world.shape == (8, 8, 3)
    np.testing.assert_allclose(world[..., 2], 1.0, atol=1e-6)


def test_world_to_map_indices_bounds():
    pc = jnp.asarray(np.array([[[0.45, 0.0, 0.35], [100.0, 0.0, 0.35],
                                [-1.0, 0.0, 0.35], [0.45, 99.0, 0.35]]], np.float32))
    idx, outliers = world_to_map_indices(
        pc, camera_height=jnp.asarray(1.0), gridcellsize=0.2,
        map_height=10, map_width=20, z_clip_threshold=0.5)
    idx = np.asarray(idx)[0]
    outliers = np.asarray(outliers)[0]
    # first point: x=0.45/0.2 -> 2, z=0.35/0.2 -> 2
    assert not outliers[0]
    assert idx[0] == 2 * 20 + 2
    assert outliers[1]          # x out of map
    assert outliers[2]          # negative
    assert outliers[3]          # above camera + z_clip (y up)
    assert idx[1] == 0 and idx[2] == 0 and idx[3] == 0
