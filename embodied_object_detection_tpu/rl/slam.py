"""SLAM-based navigation: depth mapper + differentiable planner + agent.

Re-designs the reference's slambased stack:

- `depth2local3d` / `pcl_to_obstacles` / `DirectDepthMapper`
  (habitat_baselines/slambased/mappers.py:18-140): depth -> camera-frame
  point cloud -> height-filtered global obstacle histogram. TPU-native:
  the per-cell point count is a `segment_sum` over flattened cell ids
  (the same scatter primitive as the detector's memory write) instead of
  host `np.unique`.
- `DifferentiableStarPlanner`
  (habitat_baselines/slambased/path_planners.py:66-300): the reference
  runs an A*-style wavefront with 3x3 neighbor convs in a Python loop.
  Here it is a vectorized 8-neighbor cost relaxation inside
  `lax.while_loop` (value iteration on the obstacle-cost grid) — same
  fixed point (shortest-path distance field), compiler-friendly control
  flow, differentiable end-to-end.
- `ORBSLAM2Agent` (habitat_baselines/agents/slam_agents.py:171-560):
  map-update -> replan -> waypoint-follow act loop. Pose comes from the
  simulator's agent state: the reference's pose source is the external
  ORB-SLAM2 C++ binary, which SURVEY §2.3 scopes out alongside
  habitat-sim; everything downstream of the pose is implemented.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from embodied_object_detection_tpu.rl.agents import (
    Agent, FORWARD, LEFT, RIGHT, STOP)

__all__ = ["depth2local3d", "pcl_to_obstacles", "DirectDepthMapper",
           "plan_distance_field", "trace_path", "DepthMapperAndPlannerAgent"]


def depth2local3d(depth: jnp.ndarray, fx: float, fy: float, cx: float,
                  cy: float) -> jnp.ndarray:
    """Depth [H, W] -> camera-frame point cloud [H*W, 3] (x right, y down,
    z forward). mappers.py:18-36."""
    h, w = depth.shape
    xs = jnp.arange(w, dtype=depth.dtype)
    ys = jnp.arange(h, dtype=depth.dtype)
    xv, yv = jnp.meshgrid(xs, ys)              # [H, W]
    d = depth
    return jnp.stack([(d * (xv - cx) / fx).reshape(-1),
                      (d * (yv - cy) / fy).reshape(-1),
                      d.reshape(-1)], axis=1)


@partial(jax.jit, static_argnames=("map_size_cells",))
def pcl_to_obstacles(pts2d: jnp.ndarray, weights: jnp.ndarray,
                     map_size_m: float, cell_m: float,
                     map_size_cells: int) -> jnp.ndarray:
    """Weighted point count per map cell (mappers.py:38-61).

    pts2d: [N, 2] (z, x) world-plane coords in metres, map centred at 0;
    weights: [N] 0/1 validity (fixed-shape mask instead of boolean
    filtering — XLA-friendly). Returns [S, S] float counts.
    """
    s = map_size_cells
    ij = jnp.round(pts2d / cell_m + s / 2.0).astype(jnp.int32)
    valid = (weights > 0) & jnp.all((ij >= 0) & (ij < s), axis=1)
    flat = jnp.where(valid, ij[:, 0] * s + ij[:, 1], s * s)
    counts = jax.ops.segment_sum(valid.astype(jnp.float32), flat,
                                 num_segments=s * s + 1)
    return counts[:-1].reshape(s, s)


class DirectDepthMapper:
    """Depth -> egocentric-pose-registered obstacle map
    (mappers.py:64-140). fx/fy follow the reference's FOV=90 convention
    (fx = W/2)."""

    def __init__(self, camera_height: float = 0.0, near_th: float = 0.1,
                 far_th: float = 4.0, h_min: float = 0.0,
                 h_max: float = 1.0, map_size_m: float = 40.0,
                 cell_m: float = 0.1):
        self.near_th = near_th
        self.far_th = far_th
        self.h_min = h_min
        self.h_max = h_max
        self.camera_height = camera_height
        self.map_size_m = map_size_m
        self.cell_m = cell_m
        self.map_cells = int(np.ceil(map_size_m / cell_m)) - 1

    def __call__(self, depth: jnp.ndarray,
                 pose4x4: jnp.ndarray) -> jnp.ndarray:
        """depth [H, W] metres; pose4x4 camera-to-world. -> [S, S]."""
        h, w = depth.shape
        fx, fy = w / 2.0, h / 2.0
        cx, cy = int(fx) - 1, int(fy) - 1
        pcl = depth2local3d(depth, fx, fy, cx, cy)          # [N, 3]
        rng_ok = (jnp.abs(pcl[:, 2]) >= self.near_th) & \
                 (jnp.abs(pcl[:, 2]) < self.far_th)
        ones = jnp.ones((pcl.shape[0], 1), pcl.dtype)
        world = (jnp.concatenate([pcl, ones], 1) @ pose4x4.T)[:, :3]
        height = -world[:, 1] + self.camera_height
        h_ok = (height > self.h_min) & (height < self.h_max)
        pts2d = jnp.stack([world[:, 2], world[:, 0]], axis=1)  # (z, x)
        return pcl_to_obstacles(pts2d, (rng_ok & h_ok).astype(jnp.float32),
                                self.map_size_m, self.cell_m, self.map_cells)


# --------------------------------------------------------------------------
# Planner
# --------------------------------------------------------------------------

_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
           (1, 1)]
_STEP_COSTS = [np.sqrt(2.0), 1.0, np.sqrt(2.0), 1.0, 1.0, np.sqrt(2.0), 1.0,
               np.sqrt(2.0)]


@partial(jax.jit, static_argnames=("max_steps",))
def plan_distance_field(obstacles: jnp.ndarray, goal_map: jnp.ndarray,
                        ob_cost: float = 10000.0,
                        max_steps: int = 500) -> jnp.ndarray:
    """Shortest-path cost-to-goal field over an obstacle grid.

    8-neighbor relaxation to a fixed point under lax.while_loop — the
    XLA re-expression of DifferentiableStarPlanner's conv-wavefront loop
    (path_planners.py:170-280). Entering a cell costs 1 (or sqrt(2)
    diagonally) plus ob_cost * obstacles[cell]; goal cells cost 0.
    """
    inf = 1e7
    cell_cost = 1.0 + ob_cost * obstacles
    g0 = jnp.where(goal_map > 0, 0.0, inf)

    def relax(g):
        best = g
        for (dy, dx), sc in zip(_SHIFTS, _STEP_COSTS):
            shifted = jnp.roll(g, (dy, dx), axis=(0, 1))
            # roll wraps; invalidate wrapped rows/cols
            if dy == 1:
                shifted = shifted.at[0, :].set(inf)
            elif dy == -1:
                shifted = shifted.at[-1, :].set(inf)
            if dx == 1:
                shifted = shifted.at[:, 0].set(inf)
            elif dx == -1:
                shifted = shifted.at[:, -1].set(inf)
            best = jnp.minimum(best, shifted + sc * cell_cost)
        return jnp.minimum(best, g0)

    def cond(state):
        g, prev, i = state
        return (i < max_steps) & jnp.any(jnp.abs(g - prev) > 1e-6)

    def body(state):
        g, _, i = state
        return relax(g), g, i + 1

    g, _, _ = jax.lax.while_loop(
        cond, body, (g0, jnp.full_like(g0, -1.0), jnp.asarray(0)))
    return g


def trace_path(g: np.ndarray, start_rc: Tuple[int, int],
               max_len: int = 1000) -> np.ndarray:
    """Greedy descent on the cost field -> [K, 2] (row, col) path
    (path_planners.py backtracking phase, host-side — the path is tiny)."""
    g = np.asarray(g)
    h, w = g.shape
    r, c = start_rc
    path = [(r, c)]
    for _ in range(max_len):
        best, best_rc = g[r, c], None
        for dy, dx in _SHIFTS:
            rr, cc = r + dy, c + dx
            if 0 <= rr < h and 0 <= cc < w and g[rr, cc] < best:
                best, best_rc = g[rr, cc], (rr, cc)
        if best_rc is None:
            break
        r, c = best_rc
        path.append((r, c))
        if g[r, c] <= 0:
            break
    return np.asarray(path)


# --------------------------------------------------------------------------
# Agent
# --------------------------------------------------------------------------

class DepthMapperAndPlannerAgent(Agent):
    """Map-and-plan nav agent (slam_agents.py ORBSLAM2Agent act loop with
    simulator pose; angle/waypoint following per :320-424)."""

    def __init__(self, sim, success_distance: float = 0.2,
                 goal_sensor_uuid: str = "pointgoal_with_gps_compass",
                 map_size_m: Optional[float] = None,
                 cell_m: float = 0.1, obstacle_th: float = 10.0,
                 waypoint_lookahead: int = 5,
                 angle_th: float = float(np.deg2rad(15)),
                 monodepth=None):
        self._sim = sim
        self.success_distance = success_distance
        self.goal_uuid = goal_sensor_uuid
        self.map_size_m = map_size_m or sim.size_m
        self.cell_m = cell_m
        self.obstacle_th = obstacle_th
        self.lookahead = waypoint_lookahead
        self.angle_th = angle_th
        self.mapper = DirectDepthMapper(map_size_m=self.map_size_m,
                                        cell_m=cell_m)
        # RGB-only fallback (ref: ORBSLAM2MonodepthAgent,
        # slam_agents.py:565-645 — monodepth stands in for the depth
        # sensor): an rl.monodepth.MonoDepthEstimator (or any callable
        # rgb_uint8 -> [H, W] metres)
        self.monodepth = monodepth
        self.reset()

    def reset(self):
        s = self.mapper.map_cells
        self._obstacle_counts = np.zeros((s, s), np.float32)
        self._steps = 0

    def _pose4x4(self) -> np.ndarray:
        """Camera-to-world from the 2-D agent state (x-east, z-north plane;
        y is the height axis, unused by the planar sim)."""
        st = self._sim.get_agent_state()
        cth, sth = np.cos(st.rotation), np.sin(st.rotation)
        # camera looks along +heading; camera z -> world heading dir,
        # camera x -> world right of heading. Centre the map at map/2.
        p = np.eye(4, dtype=np.float32)
        p[0, 0], p[0, 2] = sth, cth    # world x from cam x/z
        p[2, 0], p[2, 2] = -cth, sth   # world z
        p[0, 3] = st.position[0] - self.map_size_m / 2.0
        p[2, 3] = st.position[1] - self.map_size_m / 2.0
        return p

    def _to_cell(self, xz: np.ndarray) -> Tuple[int, int]:
        """World coords -> map cell, registered to pcl_to_obstacles'
        rasterization: obstacle cell = round(p/cell + s/2) with p measured
        from the map centre (= coord - size/2), i.e. round(coord/cell -
        size/(2*cell) + s/2). Using plain round(coord/cell) here would be
        off by half a cell against the obstacle grid (s = ceil(size/cell)-1)."""
        s = self.mapper.map_cells
        off = s / 2.0 - self.map_size_m / (2.0 * self.cell_m)
        r = int(round(xz[1] / self.cell_m + off))
        c = int(round(xz[0] / self.cell_m + off))
        return (int(np.clip(r, 0, s - 1)), int(np.clip(c, 0, s - 1)))

    def update_map(self, observations: Dict[str, np.ndarray]) -> None:
        if "depth" in observations:
            depth = np.asarray(observations["depth"], np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
            if depth.max() <= 1.0 + 1e-6:   # normalized sensor -> metres
                depth = depth * self._sim.max_depth
        elif self.monodepth is not None and "rgb" in observations:
            # predicted depth from the RGB frame (monodepth agent path)
            depth = np.asarray(self.monodepth.compute_depth(
                np.asarray(observations["rgb"], np.uint8)), np.float32)
        else:
            return
        counts = self.mapper(jnp.asarray(depth),
                             jnp.asarray(self._pose4x4()))
        self._obstacle_counts += np.asarray(counts)

    def act(self, observations: Dict[str, np.ndarray]) -> int:
        rho_phi = observations[self.goal_uuid]
        if rho_phi[0] <= self.success_distance:
            return STOP
        self.update_map(observations)
        self._steps += 1

        st = self._sim.get_agent_state()
        # goal position in world from rho/phi + pose
        ang = st.rotation + float(rho_phi[1])
        goal_xz = st.position + rho_phi[0] * np.array(
            [np.cos(ang), np.sin(ang)], np.float32)
        s = self.mapper.map_cells
        goal_map = np.zeros((s, s), np.float32)
        goal_map[self._to_cell(goal_xz)] = 1.0
        obstacles = (self._obstacle_counts > self.obstacle_th).astype(
            np.float32)
        g = np.asarray(plan_distance_field(jnp.asarray(obstacles),
                                           jnp.asarray(goal_map)))
        path = trace_path(g, self._to_cell(st.position))
        if len(path) <= 1:
            return FORWARD  # no plan; probe ahead
        wp = path[min(self.lookahead, len(path) - 1)]
        s = self.mapper.map_cells
        off = s / 2.0 - self.map_size_m / (2.0 * self.cell_m)
        wp_xz = np.array([(wp[1] - off) * self.cell_m,
                          (wp[0] - off) * self.cell_m])
        to_wp = wp_xz - st.position
        angle = float((np.arctan2(to_wp[1], to_wp[0]) - st.rotation + np.pi)
                      % (2 * np.pi) - np.pi)
        if abs(angle) > self.angle_th:
            return LEFT if angle > 0 else RIGHT
        return FORWARD
