"""RL train/eval entry point (habitat_baselines/run.py analog).

    python -m embodied_object_detection_tpu.rl.run --run-type train \
        --num-envs 4 --num-updates 50 --checkpoint-dir /tmp/ppo_ckpts
    python -m embodied_object_detection_tpu.rl.run --run-type eval \
        --checkpoint /tmp/ppo_ckpts/ckpt.49.pkl

The reference dispatches on --run-type + an exp config into
PPOTrainer.train()/eval() (run.py:17-70, ppo_trainer.py); here the
trainer config maps from flags, the env pool is the grid-world pointnav
stack, and --distributed turns on the mesh-sharded DD-PPO update.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-type", choices=["train", "eval"], default="train")
    p.add_argument("--num-envs", type=int, default=4)
    p.add_argument("--num-steps", type=int, default=64)
    p.add_argument("--num-updates", type=int, default=20)
    p.add_argument("--hidden-size", type=int, default=128)
    p.add_argument("--rgb", action="store_true",
                   help="use the rgb raycast sensor + CNN encoder")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--max-episode-steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--ppo-epoch", type=int, default=2)
    p.add_argument("--num-mini-batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-interval", type=int, default=10)
    p.add_argument("--checkpoint", default=None, help="eval checkpoint path")
    p.add_argument("--eval-episodes", type=int, default=8)
    p.add_argument("--distributed", action="store_true",
                   help="DD-PPO over the data mesh axis")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (8 virtual devices)")
    return p


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from embodied_object_detection_tpu.rl.nav import make_nav_rl_env
    from embodied_object_detection_tpu.rl.ppo import PPOConfig
    from embodied_object_detection_tpu.rl.trainer import (
        PPOTrainer, PPOTrainerConfig)

    def env_fn(i: int):
        return make_nav_rl_env(
            scene_ids=(f"scene{i % args.scenes}",), episodes_per_scene=8,
            seed=args.seed + i, max_episode_steps=args.max_episode_steps,
            with_rgb=args.rgb)

    mesh = None
    if args.distributed:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ("data",))
        n_dev = len(jax.devices())
        assert args.num_envs % n_dev == 0, (
            f"num_envs ({args.num_envs}) must be a multiple of the device "
            f"count ({n_dev}) for DD-PPO; per-device envs must also be "
            f"divisible by --num-mini-batch ({args.num_mini_batch})")

    cfg = PPOTrainerConfig(
        num_envs=args.num_envs, num_steps=args.num_steps,
        num_updates=args.num_updates, hidden_size=args.hidden_size,
        with_rgb=args.rgb,
        ppo=PPOConfig(lr=args.lr, ppo_epoch=args.ppo_epoch,
                      num_mini_batch=args.num_mini_batch),
        seed=args.seed, checkpoint_folder=args.checkpoint_dir,
        checkpoint_interval=(args.checkpoint_interval
                             if args.checkpoint_dir else 0),
        distributed=args.distributed)
    trainer = PPOTrainer(cfg, env_fn, mesh=mesh)

    if args.run_type == "train":
        log = trainer.train()
        for row in log[-5:]:
            print(json.dumps(row))
        if args.checkpoint_dir:
            path = trainer.save_checkpoint("ckpt.final.pkl")
            print(f"saved {path}")
    else:
        if args.checkpoint:
            trainer.load_checkpoint(args.checkpoint)
        stats = trainer.evaluate(env_fn(997), num_episodes=args.eval_episodes,
                                 max_steps=args.max_episode_steps)
        print(json.dumps(stats))
    trainer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
