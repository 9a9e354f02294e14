"""Optimizer / LR schedule / parameter freezing.

ref: Detic/detic/custom_solver.py (build_custom_optimizer): AdamW with
per-parameter LR multipliers — BACKBONE_MULTIPLIER for backbone params,
CUSTOM_MULTIPLIER (x10) for names containing CUSTOM_MULTIPLIER_NAME
("map_merge") — plus full-model gradient clipping; WarmupCosineLR schedule;
backbone freezing via MODEL.FREEZE_BACKBONE / UNFROZEN_LAYERS
(train_mp3d.py:704-710).

In optax this becomes: multi_transform over a label tree (lr groups),
masked zero-updates for frozen params, clip_by_global_norm, and a cosine
schedule with linear warmup.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import SolverConfig

# FrozenBN statistics / affine are never trained (detectron2 FrozenBatchNorm2d)
FROZEN_BN_KEYS = ("running_mean", "running_var")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_labels(params, cfg: SolverConfig) -> Any:
    """Label tree: 'frozen' | 'backbone' | 'custom' | 'backbone_custom' |
    'default'.

    Mirrors custom_solver.py:24-44: name-substring routing with
    MULTIPLICATIVE multipliers (`lr *= BACKBONE_MULTIPLIER` then
    `lr *= CUSTOM_MULTIPLIER` — both can apply to one param, hence the
    combined 'backbone_custom' group). The reference's `backbone.*`
    namespace is the FPN-wrapped trunk (CustomRecurrentFPN, timm.py:54 —
    fpn_lateral/fpn_output/map_merge_projection all live under
    `backbone.`), so our sibling 'fpn' module belongs to the backbone
    group too."""
    def label(path, leaf):
        name = _path_str(path)
        if any(k in name for k in FROZEN_BN_KEYS):
            return "frozen"
        if "bn" in name.split("/")[-2:][0] and name.endswith(("weight", "bias")):
            # FrozenBN affine: also frozen (converted FrozenBatchNorm2d)
            if "/bn" in name or "downsample_bn" in name:
                return "frozen"
        # freeze only when UNFROZEN_LAYERS is non-empty: the reference's
        # freezing loop body never executes for an empty list
        # (train_mp3d.py:704-710), so FREEZE_BACKBONE + [] freezes NOTHING
        # — freezing everything would silently flatline training
        if cfg.freeze_backbone and cfg.unfrozen_layers:
            if not any(l in name for l in cfg.unfrozen_layers):
                # map our module names onto the reference's UNFROZEN_LAYERS
                # vocabulary: 'roi' -> roi_heads, 'proposal_generator' ->
                # centernet, 'map_merge' -> fpn map_merge projections
                alias = {"roi": "roi_heads", "proposal_generator": "centernet",
                         "map_merge": "map_merge"}
                if not any(alias.get(l, l) in name for l in cfg.unfrozen_layers):
                    return "frozen"
        parts = name.split("/")
        is_backbone = "backbone" in parts or "fpn" in parts
        is_custom = any(n in name for n in cfg.custom_multiplier_name)
        if is_backbone and is_custom:
            return "backbone_custom"
        if is_custom:
            return "custom"
        if is_backbone:
            return "backbone"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _warmup(cfg: SolverConfig, step):
    return cfg.warmup_factor + (1 - cfg.warmup_factor) * \
        jnp.minimum(step / max(cfg.warmup_iters, 1), 1.0)


def warmup_cosine_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """WarmupCosineLR (detectron2): lr = base * warmup_factor(t) *
    0.5*(1 + cos(pi*t/max_iter)) — the cosine applies DURING warmup too
    (multiplicative, no discontinuity at warmup end; d2 _get_warmup_factor
    multiplies the base schedule)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cos = 0.5 * (1 + jnp.cos(math.pi * step / max(cfg.max_iter, 1)))
        return cfg.base_lr * _warmup(cfg, step) * cos
    return schedule


def warmup_multistep_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """WarmupMultiStepLR (the detectron2 default; vanilla COCO configs):
    lr = base * warmup_factor(t) * gamma ** (#milestones passed)."""
    steps = jnp.asarray(cfg.steps or (cfg.max_iter + 1,), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        k = jnp.sum(step >= steps).astype(jnp.float32)
        return cfg.base_lr * _warmup(cfg, step) * cfg.gamma ** k
    return schedule


def lr_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """SOLVER.LR_SCHEDULER_NAME dispatch (d2 build_lr_scheduler)."""
    name = cfg.lr_scheduler
    if name in ("warmup_cosine", "WarmupCosineLR"):
        return warmup_cosine_schedule(cfg)
    if name in ("warmup_multistep", "WarmupMultiStepLR"):
        return warmup_multistep_schedule(cfg)
    raise NotImplementedError(f"no LR scheduler {name!r}")


def build_optimizer(params, cfg: SolverConfig) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg)

    # SOLVER.OPTIMIZER dispatch (custom_solver.py:64-76): ADAMW decoupled
    # decay, or SGD with momentum/nesterov and coupled L2 (torch SGD folds
    # weight_decay into the grad BEFORE the momentum buffer — so decay goes
    # ahead of trace here too)
    opt = cfg.optimizer.upper()
    if opt == "ADAMW":
        def core():
            return [optax.scale_by_adam(),
                    optax.add_decayed_weights(cfg.weight_decay)]
    elif opt == "SGD":
        def core():
            tx = [optax.add_decayed_weights(cfg.weight_decay)]
            if cfg.momentum:
                tx.append(optax.trace(decay=cfg.momentum,
                                      nesterov=cfg.nesterov))
            return tx
    else:
        raise NotImplementedError(f"no optimizer type {cfg.optimizer!r}")

    def group(mult: float):
        return optax.chain(
            *core(),
            optax.scale_by_learning_rate(lambda s: schedule(s) * mult),
        )

    labels = param_labels(params, cfg)
    tx = optax.multi_transform(
        {
            "default": group(1.0),
            "backbone": group(cfg.backbone_multiplier),
            "custom": group(cfg.custom_multiplier),
            "backbone_custom": group(cfg.backbone_multiplier *
                                     cfg.custom_multiplier),
            "frozen": optax.set_to_zero(),
        },
        labels)
    # reference semantics: clipping is active only when clip_norm_val > 0
    # (custom_solver.py:49-53) — CLIP_VALUE 0.0 with ENABLED True disables
    # it; clip_by_global_norm(0.0) would zero every update instead
    if cfg.clip_gradients and cfg.clip_value > 0:
        # Clip over TRAINABLE grads only: the reference's param_groups hold
        # requires_grad params exclusively (custom_solver.py:27-31, 56-58);
        # FrozenBN stats are torch buffers with no grad at all. Our
        # value_and_grad produces real grads for frozen leaves — zero them
        # BEFORE clipping so they can't inflate a norm.
        frozen = jax.tree_util.tree_map(lambda l: l == "frozen", labels)
        if cfg.clip_type == "value":
            # detectron2's DEFAULT CLIP_TYPE — every C2 config (incl. the
            # flagship mp3d yaml) sets only ENABLED: True, so the reference
            # runs elementwise clip_grad_value_(1.0), NOT a full-model norm
            clip = optax.clip(cfg.clip_value)
        elif cfg.clip_type == "full_model":
            # custom_solver.py:46-62 FullModelGradientClippingOptimizer
            # (only active when a config sets CLIP_TYPE 'full_model')
            clip = optax.clip_by_global_norm(cfg.clip_value)
        else:
            raise NotImplementedError(
                f"no gradient clip type {cfg.clip_type!r}")
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen),
                         clip, tx)
    return tx
