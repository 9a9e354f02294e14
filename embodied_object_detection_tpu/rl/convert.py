"""Habitat PPO checkpoint -> flax policy params.

Converts the reference trainer's torch `state_dict` layout
(habitat_baselines PointNavBaselinePolicy: `net.visual_encoder.cnn.*`,
`net.state_encoder.rnn.*`, `action_distribution.linear`, `critic.fc`;
ppo_trainer.py save_checkpoint stores it under "state_dict" with an
`actor_critic.` prefix) into the rl/policy.py module tree, so
reference-trained pointnav agents run on the TPU stack unchanged.

Weight rules:
  conv   [O, I, kh, kw] -> HWIO
  linear [O, I]         -> [I, O]
  GRU    weight_ih_l0 [3H, in] -> ih/kernel [in, 3H] (r|z|n gate order is
         torch's own, which GRUCell in rl/policy.py reproduces exactly)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["convert_pointnav_policy", "load_habitat_checkpoint"]


def _put(tree: dict, path: str, value: np.ndarray) -> None:
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def convert_pointnav_policy(state_dict: Dict[str, np.ndarray],
                            blind: bool = True) -> dict:
    """torch state_dict -> flax params for rl.policy.PointNavPolicy."""
    sd = {k.replace("actor_critic.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    p: dict = {}

    # GRU (net.state_encoder.rnn.*): torch packs r|z|n rows
    _put(p, "net/GRUStateEncoder_0/GRUCell_0/ih/kernel",
         sd["net.state_encoder.rnn.weight_ih_l0"].T)
    _put(p, "net/GRUStateEncoder_0/GRUCell_0/ih/bias",
         sd["net.state_encoder.rnn.bias_ih_l0"])
    _put(p, "net/GRUStateEncoder_0/GRUCell_0/hh/kernel",
         sd["net.state_encoder.rnn.weight_hh_l0"].T)
    _put(p, "net/GRUStateEncoder_0/GRUCell_0/hh/bias",
         sd["net.state_encoder.rnn.bias_hh_l0"])

    if not blind:
        # SimpleCNN (net.visual_encoder.cnn.{0,2,4} convs + .6 linear)
        for flax_i, torch_i in ((0, 0), (1, 2), (2, 4)):
            _put(p, f"net/SimpleCNN_0/Conv_{flax_i}/kernel",
                 sd[f"net.visual_encoder.cnn.{torch_i}.weight"]
                 .transpose(2, 3, 1, 0))
            _put(p, f"net/SimpleCNN_0/Conv_{flax_i}/bias",
                 sd[f"net.visual_encoder.cnn.{torch_i}.bias"])
        _put(p, "net/SimpleCNN_0/Dense_0/kernel",
             sd["net.visual_encoder.cnn.6.weight"].T)
        _put(p, "net/SimpleCNN_0/Dense_0/bias",
             sd["net.visual_encoder.cnn.6.bias"])

    _put(p, "action_head/kernel", sd["action_distribution.linear.weight"].T)
    _put(p, "action_head/bias", sd["action_distribution.linear.bias"])
    _put(p, "critic/kernel", sd["critic.fc.weight"].T)
    _put(p, "critic/bias", sd["critic.fc.bias"])
    return {"params": p}


def load_habitat_checkpoint(path: str, blind: bool = True) -> dict:
    """Load a habitat ppo_trainer checkpoint (.pth) and convert."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_pointnav_policy(sd, blind=blind)
