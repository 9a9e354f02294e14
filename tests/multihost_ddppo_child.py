"""Child process for the multi-host DD-PPO smoke test (launched by
test_multihost.py). Runs one DD-PPO update over a 2-process
jax.distributed CPU cluster with envs sharded across the global mesh —
the TPU-native analog of the reference's NCCL/GLOO DD-PPO rendezvous
(habitat_baselines/rl/ddppo/algo/ddp_utils.py:114-166)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main(process_id: int, port: str):
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from embodied_object_detection_tpu.rl.ddppo import make_ddppo
    from embodied_object_detection_tpu.rl.policy import (
        PointNavPolicy, init_policy)
    from embodied_object_detection_tpu.rl.ppo import PPOConfig
    from embodied_object_detection_tpu.rl.nav import make_nav_rl_env

    devices = jax.devices()
    assert len(devices) == 4, devices
    mesh = Mesh(np.asarray(devices), ("data",))

    T, N_global, N_local, H = 5, 8, 4, 32
    env = make_nav_rl_env(scene_ids=("mh",), episodes_per_scene=2)
    policy = PointNavPolicy(dim_actions=4, hidden_size=H, blind=True)
    params = init_policy(policy, env.observation_space,
                         jax.random.PRNGKey(0), N_global)
    env.close()

    def evaluate_actions(p, obs, h0, prev, masks, actions):
        return policy.apply(p, obs, h0, prev, masks, actions,
                            method=PointNavPolicy.evaluate_actions)

    cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1)
    init_state, update = make_ddppo(evaluate_actions, cfg, mesh)
    state = init_state(params)

    rng = np.random.RandomState(7)
    full = {
        "observations": {"pointgoal_with_gps_compass":
                         rng.randn(T, N_global, 2).astype(np.float32)},
        "hidden0": np.zeros((N_global, H), np.float32),
        "actions": rng.randint(0, 4, (T, N_global)).astype(np.int32),
        "prev_actions": rng.randint(0, 4, (T, N_global)).astype(np.int32),
        "value_preds": rng.randn(T, N_global).astype(np.float32),
        "returns": rng.randn(T, N_global).astype(np.float32),
        "masks": np.ones((T, N_global), np.float32),
        "old_log_probs": np.full((T, N_global), np.log(0.25), np.float32),
    }

    def to_global(x, env_axis):
        spec = P(*(None,) * env_axis, "data")
        sharding = NamedSharding(mesh, spec)
        sl = [slice(None)] * x.ndim
        sl[env_axis] = slice(process_id * N_local, (process_id + 1) * N_local)
        return jax.make_array_from_process_local_data(sharding, x[tuple(sl)],
                                                      x.shape)

    batch = {k: (jax.tree_util.tree_map(lambda a: to_global(a, 1), v)
                 if k == "observations" else
                 to_global(v, 0) if k == "hidden0" else to_global(v, 1))
             for k, v in full.items()}

    state2, metrics = update(state, batch, jax.random.PRNGKey(5))
    vl = float(jax.device_get(metrics["value_loss"]))
    al = float(jax.device_get(metrics["action_loss"]))
    # params must have moved and be replicated/finite
    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(state2.params)[0]))
    assert np.isfinite(leaf).all()
    print(f"MULTIHOST_DDPPO_OK value_loss={vl:.6f} action_loss={al:.6f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
