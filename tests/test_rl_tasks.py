"""ObjectNav / EQA / VLN task variants."""

import numpy as np

from embodied_object_detection_tpu.rl.core import Env
from embodied_object_detection_tpu.rl.sim import GridSimulator
from embodied_object_detection_tpu.rl import tasks as T
from embodied_object_detection_tpu.rl import nav


def _env(task_cls, make_ds, scene="tscene0", **kw):
    sim = GridSimulator(render_rgb=False)
    ds = make_ds(sim, [scene], **kw)
    task = task_cls.build(sim)
    return Env(task, ds, max_episode_steps=30, seed=0)


def test_objectnav_sensor_and_distance():
    env = _env(T.ObjectNavigationTask, T.make_objectnav_dataset,
               episodes_per_scene=3)
    obs = env.reset()
    assert obs["objectgoal"].shape == (1,)
    cat_id = int(obs["objectgoal"][0])
    assert 0 <= cat_id < len(T.CATEGORIES)
    env.step(1)
    m = env.get_metrics()
    assert np.isfinite(m["distance_to_goal"])
    # min-over-instances: metric <= distance to the pointgoal reference
    ep = env.current_episode
    d_ref = env.sim.geodesic_distance(
        env.sim.get_agent_state().position, np.asarray(ep.info["goal"]))
    assert m["distance_to_goal"] <= d_ref + 1e-6
    env.close()


def test_objectnav_success_near_any_instance():
    env = _env(T.ObjectNavigationTask, T.make_objectnav_dataset,
               episodes_per_scene=3)
    env.reset()
    ep = env.current_episode
    # teleport next to an instance, then stop
    env.sim.agent.position = np.asarray(ep.info["goal_positions"][0],
                                        np.float32) + 0.05
    env.step(0)
    assert env.get_metrics()["success"] == 1.0
    env.close()


def test_eqa_answer_accuracy():
    env = _env(T.EQATask, T.make_eqa_dataset, episodes_per_scene=3)
    obs = env.reset()
    assert obs["question"].shape == (T.MAX_QUESTION_LEN,)
    ep = env.current_episode
    env.task.pending_answer = ep.info["answer_id"]
    env.step("answer")
    m = env.get_metrics()
    assert m["answer_accuracy"] == 1.0
    assert m["correct_answer"] == ep.info["answer_id"]
    assert env.episode_over

    # wrong answer -> 0
    env.reset()
    env.task.pending_answer = (env.current_episode.info["answer_id"] + 1) % \
        len(T.ANSWERS)
    env.step("answer")
    assert env.get_metrics()["answer_accuracy"] == 0.0
    env.close()


def test_vln_instruction_and_path():
    env = _env(T.VLNTask, T.make_vln_dataset, episodes_per_scene=3)
    obs = env.reset()
    assert obs["instruction"].shape == (T.MAX_QUESTION_LEN,)
    path = env.current_episode.info["reference_path"]
    assert len(path) == 3
    np.testing.assert_allclose(path[0], env.current_episode.start_position,
                               atol=1e-6)
    env.close()


def test_dataset_generators_gate_reachability():
    """Every generated episode must have a finite start->goal geodesic:
    random rectangle scenes can enclose free pockets, and an unreachable
    goal makes DistanceToGoal inf -> NaN rewards poisoning PPO (the gate
    make_pointnav_dataset always had, applied to all task generators)."""
    sim = GridSimulator(render_rgb=False)
    for make_ds, goal_key in ((T.make_objectnav_dataset, "goal_positions"),
                              (T.make_eqa_dataset, "goal"),
                              (T.make_vln_dataset, "goal")):
        # several scenes for coverage; the seed-salted scenes differ
        ds = make_ds(sim, [f"reach{i}" for i in range(4)],
                     episodes_per_scene=4, seed=3)
        assert len(ds.episodes) > 0
        for ep in ds.episodes:
            sim._scene_id = ep.scene_id
            sim._occ = sim.scene_occupancy(ep.scene_id)
            goals = ep.info[goal_key]
            goals = goals if goal_key == "goal_positions" else [goals]
            dists = [sim.geodesic_distance(
                np.asarray(ep.start_position), np.asarray(g))
                for g in goals]
            assert np.all(np.isfinite(dists)), (ep.episode_id, dists)


def test_place_objects_deterministic():
    sim = GridSimulator(render_rgb=False)
    a = T.place_objects(sim, "detscene")
    b = T.place_objects(sim, "detscene")
    assert [o.category for o in a] == [o.category for o in b]
    for oa, ob in zip(a, b):
        np.testing.assert_allclose(oa.position, ob.position)


def test_dataset_json_roundtrip(tmp_path):
    """habitat/core/dataset.py:168-208 to_json/from_json parity surface."""
    from embodied_object_detection_tpu.rl.core import Dataset
    sim = GridSimulator(render_rgb=False)
    ds = T.make_eqa_dataset(sim, ["jscene"], episodes_per_scene=3)
    blob = ds.to_json()
    back = Dataset.from_json(blob)
    assert len(back.episodes) == len(ds.episodes)
    for a, b in zip(ds.episodes, back.episodes):
        assert a.episode_id == b.episode_id and a.scene_id == b.scene_id
        np.testing.assert_allclose(a.start_position, b.start_position)
        assert a.start_rotation == b.start_rotation
        np.testing.assert_array_equal(
            np.asarray(a.info["question_tokens"]),
            np.asarray(b.info["question_tokens"]))
        assert a.info["answer_id"] == b.info["answer_id"]
    # an Env can run on the deserialized dataset
    task = T.EQATask.build(sim)
    env = Env(task, back, max_episode_steps=5, seed=0)
    obs = env.reset()
    assert obs["question"].shape[0] == T.MAX_QUESTION_LEN
    env.close()


def test_episode_iterator_scene_grouping():
    """dataset.py:330-430: group_by_scene keeps scenes contiguous; a
    max_scene_repeat_episodes cap forces a scene switch."""
    from embodied_object_detection_tpu.rl.core import (
        Episode, EpisodeIterator)
    eps = []
    for scene in ("a", "b"):
        for k in range(4):
            eps.append(Episode(f"{scene}{k}", scene,
                               np.zeros(2, np.float32), 0.0))
    rng = np.random.RandomState(0)
    rng.shuffle(eps)

    it = EpisodeIterator(eps, group_by_scene=True, shuffle=False)
    seq = [next(it).scene_id for _ in range(8)]
    # contiguous groups: exactly one transition point
    assert sum(1 for i in range(1, 8) if seq[i] != seq[i - 1]) == 1

    it2 = EpisodeIterator(eps, group_by_scene=True,
                          max_scene_repeat_episodes=2)
    seq2 = [next(it2).scene_id for _ in range(8)]
    # never more than 2 consecutive episodes of the same scene
    run, longest = 1, 1
    for i in range(1, 8):
        run = run + 1 if seq2[i] == seq2[i - 1] else 1
        longest = max(longest, run)
    assert longest <= 2
    # all episodes still served exactly once per cycle
    assert sorted(seq2) == ["a"] * 4 + ["b"] * 4
