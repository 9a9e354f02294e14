"""SLAM stack: mapper geometry, planner vs Dijkstra oracle, agent loop."""

import heapq

import numpy as np
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.rl.core import Episode
from embodied_object_detection_tpu.rl.nav import make_nav_rl_env
from embodied_object_detection_tpu.rl.sim import GridSimulator
from embodied_object_detection_tpu.rl.slam import (
    DepthMapperAndPlannerAgent, DirectDepthMapper, depth2local3d,
    pcl_to_obstacles, plan_distance_field, trace_path)
from embodied_object_detection_tpu.rl.agents import Benchmark


def test_depth2local3d_center_ray():
    h, w = 32, 32
    depth = jnp.full((h, w), 2.0)
    fx, fy = w / 2.0, h / 2.0
    cx, cy = int(fx) - 1, int(fy) - 1
    pcl = np.asarray(depth2local3d(depth, fx, fy, cx, cy)).reshape(h, w, 3)
    # principal-point pixel: pure forward ray
    np.testing.assert_allclose(pcl[cy, cx], [0, 0, 2.0], atol=1e-6)
    # rightmost pixel on the center row: x = d*(w-1-cx)/fx
    np.testing.assert_allclose(pcl[cy, w - 1, 0], 2.0 * (w - 1 - cx) / fx,
                               atol=1e-6)


def test_pcl_to_obstacles_counts():
    pts = jnp.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [50.0, 50.0]])
    w = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    m = np.asarray(pcl_to_obstacles(pts, w, 4.0, 1.0, 3))
    # map cells: round(coord/1 + 1.5); (0,0) -> (2,2) clipped? s=3:
    # round(0+1.5)=2 -> cell (2,2) counts 2; (1,1)->(2,2)? round(2.5)=2
    assert m.sum() == 3  # far point dropped
    # masked weights drop points
    m2 = np.asarray(pcl_to_obstacles(pts, jnp.asarray([0.0, 1, 1, 1]),
                                     4.0, 1.0, 3))
    assert m2.sum() == 2


def _dijkstra(obstacles, goal_rc):
    h, w = obstacles.shape
    inf = 1e7
    dist = np.full((h, w), inf)
    dist[goal_rc] = 0.0
    pq = [(0.0, goal_rc)]
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                rr, cc = r + dr, c + dc
                if not (0 <= rr < h and 0 <= cc < w):
                    continue
                step = np.sqrt(2.0) if dr and dc else 1.0
                nd = d + step * (1.0 + 10000.0 * obstacles[rr, cc])
                if nd < dist[rr, cc]:
                    dist[rr, cc] = nd
                    heapq.heappush(pq, (nd, (rr, cc)))
    return dist


def test_planner_matches_dijkstra(rng):
    h, w = 16, 16
    obstacles = (rng.rand(h, w) < 0.2).astype(np.float32)
    goal = (12, 3)
    obstacles[goal] = 0
    goal_map = np.zeros((h, w), np.float32)
    goal_map[goal] = 1.0
    g = np.asarray(plan_distance_field(jnp.asarray(obstacles),
                                       jnp.asarray(goal_map)))
    want = _dijkstra(obstacles, goal)
    reach = want < 1e6
    np.testing.assert_allclose(g[reach], want[reach], rtol=1e-5)


def test_trace_path_descends_to_goal():
    obstacles = np.zeros((12, 12), np.float32)
    obstacles[4:8, 5] = 1.0  # wall
    goal_map = np.zeros_like(obstacles)
    goal_map[6, 9] = 1.0
    g = np.asarray(plan_distance_field(jnp.asarray(obstacles),
                                       jnp.asarray(goal_map)))
    path = trace_path(g, (6, 1))
    assert tuple(path[-1]) == (6, 9)
    # path must route around the wall, never through it
    for r, c in path:
        assert obstacles[r, c] == 0


def test_mapper_marks_wall_ahead():
    sim = GridSimulator(image_hw=(64, 64))
    # face the -x border wall from 1 m away (inside the mapper's far_th)
    ep = Episode("e", "slamscene", np.array([1.0, 6.4], np.float32),
                 float(np.pi))
    sim.reset(ep)
    depth = sim.render_depth()[..., 0]
    mapper = DirectDepthMapper(map_size_m=sim.size_m, cell_m=0.2,
                               far_th=sim.max_depth)
    # pose: identity rotation (heading 0 = +x), centred map
    agent = DepthMapperAndPlannerAgent(sim, cell_m=0.2)
    counts = np.asarray(agent.mapper(jnp.asarray(depth),
                                     jnp.asarray(agent._pose4x4())))
    assert counts.sum() > 0  # wall points registered


def test_raycast_planar_depth_flat_wall():
    """A flat wall perpendicular to the heading must back-project onto a
    single plane: render_depth is PLANAR pinhole z-depth at tan-linear
    columns (the mapper's convention, mappers.py:18-36) — raw Euclidean
    ray distance at angle-linear columns would put edge columns ~41%
    too deep under the default 90-degree hfov."""
    sim = GridSimulator(image_hw=(8, 64))
    # face the -x border wall from ~1 m away: every ray within +-45 deg
    # hits the same wall plane (scene is 12.8 m wide, agent at mid-z)
    sim.reset(Episode("e", "slamscene",
                      np.array([1.0, 6.4], np.float32), float(np.pi)))
    depth = sim.render_depth()[0, :, 0]                 # one row, [W]
    # planar depth of a flat wall is constant across columns up to the
    # DDA march quantization (step = cell_m/2, plus cell rounding)
    assert float(depth.max() - depth.min()) < 3 * sim.cell_m, depth
    # and the camera-frame point cloud lands on one z-plane
    w = depth.shape[0]
    fx, cx = w / 2.0, int(w / 2) - 1
    pcl = np.asarray(depth2local3d(jnp.asarray(
        np.broadcast_to(depth, (8, w)).copy()), fx, 8 / 2.0, cx, 3))
    z = pcl[:, 2]
    assert float(z.max() - z.min()) < 3 * sim.cell_m


def test_slam_agent_navigates():
    env = make_nav_rl_env(scene_ids=("slam0",), episodes_per_scene=4,
                          seed=0, max_episode_steps=120, with_rgb=False)
    # give the agent depth observations
    from embodied_object_detection_tpu.rl.nav import DepthSensor
    task = env.habitat_env.task
    task.sensor_suite.sensors["depth"] = DepthSensor(
        image_hw=env.habitat_env.sim.image_hw)
    task.sensor_suite.observation_spaces.spaces["depth"] = \
        task.sensor_suite.sensors["depth"].observation_space

    agent = DepthMapperAndPlannerAgent(env.habitat_env.sim)
    stats = Benchmark(env.habitat_env).evaluate(agent, num_episodes=2)
    assert np.isfinite(stats["distance_to_goal"])
    assert agent._obstacle_counts.sum() > 0
    env.close()
