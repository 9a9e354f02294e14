"""RL / embodied-navigation substrate (habitat-lab analog).

TPU-native re-design of the reference's habitat-lab layer
(/root/reference/habitat-lab): host-side env/task/simulator abstractions
feeding a JAX actor-critic trained with (DD-)PPO on device.

Layout:
  core.py     habitat/core analog — Sensor/Measure/Task/Env/RLEnv/registry
  sim.py      Simulator protocol + GridSimulator (habitat-sim stand-in)
  nav.py      PointNav task: sensors, measures, actions, NavRLEnv
  policy.py   flax actor-critic (SimpleCNN + GRU state encoder)
  rollout.py  device-resident rollout storage + scan-based GAE
  ppo.py      functional PPO update (single jit over epochs x minibatches)
  ddppo.py    decentralized distributed PPO over a jax Mesh + preemption utils
  trainer.py  PPO trainer loop over VectorEnv
"""

from embodied_object_detection_tpu.rl import (  # noqa: F401
    agents, config, core, nav, sim, slam, stream_sim, tasks)
from embodied_object_detection_tpu.rl.agents import Agent, Benchmark  # noqa: F401
from embodied_object_detection_tpu.rl.core import Env, RLEnv, registry  # noqa: F401
