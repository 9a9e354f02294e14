"""Sharded training step (the analog of the reference's DDP iteration).

ref: Detic/train_mp3d.py:585-642 (do_train loop body): forward over a batch
of episode frames, loss sum, backward, AdamW step, loss reduce across ranks.
Here: one jitted step over a Mesh — the batch is sharded on the 'data' axis,
params/optimizer state replicated; XLA inserts the gradient all-reduce over
ICI where DDP used NCCL buckets, and the returned loss dict is the global
mean (the analog of comm.reduce_dict, :620-621).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DetectorConfig
from ..engine.solver import build_optimizer
from ..models.detector import EmbodiedDetector
from ..ops.memory_ops import memory_read_batched
from ..structures import GroundTruth


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class TrainBatch(NamedTuple):
    """A batch of independent frames (training never carries memory online —
    memory comes precomputed per frame, ref: custom_rcnn.py:444-464)."""
    image: jax.Array          # [B, H, W, 3]
    proj_indices: jax.Array   # [B, H, W]
    mem_features: jax.Array   # [B, cells, D]
    mem_obs: jax.Array        # [B, cells]
    gt_boxes: jax.Array       # [B, G, 4]
    gt_classes: jax.Array     # [B, G]
    gt_valid: jax.Array       # [B, G]
    # per-frame loss weight: 0 marks padding rows added to make B divisible
    # by the mesh data axis (the DDP analog requires divisible batches too)
    weight: jax.Array         # [B]
    # reference loss normalizer, broadcast per row: the reference divides
    # summed losses by n_chunks * frames-in-FIRST-chunk
    # (custom_rcnn.py:541-544), which differs from the valid-frame count
    # when sampled chunks are ragged. None -> normalize by sum(weight).
    loss_norm: "jax.Array | None" = None


def make_train_step(model: EmbodiedDetector, cfg: DetectorConfig, tx=None,
                    fed_freq_weight=None):
    """Returns (init_state_fn, step_fn). step_fn is jit-compiled with batch
    sharded over the mesh data axis.

    `fed_freq_weight` ([C] image-count**0.5 from data.catalog.load_class_freq)
    enables the federated loss when cfg.roi.use_fed_loss is set — the
    LVIS-style vanilla training capability (ref: detic_fast_rcnn.py:214-224
    via train_net.py with lvis_v1_train_cat_info.json)."""
    fed_w = None if fed_freq_weight is None else \
        jnp.asarray(fed_freq_weight, jnp.float32)

    def loss_fn(params, batch: TrainBatch, zs_weight, step):
        def one_frame(image, proj, memf, memo, gb, gc, gv, key, ego):
            gt = GroundTruth(boxes=gb, classes=gc, valid=gv)
            # 'drop_path' feeds swin stochastic depth (unused by the R50
            # trunk — flax ignores unused rng collections)
            return model.apply(params, image, zs_weight, memf, memo, proj, gt,
                               key, method=EmbodiedDetector.frame_train,
                               defer_centernet_norm=True,
                               fed_freq_weight=fed_w, ego=ego,
                               rngs={"drop_path": jax.random.fold_in(key, 7)})
        # per-frame proposal-sampling keys, deterministic per step
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(17), step),
            batch.image.shape[0])
        # memory read hoisted OUT of the vmap as one flat batched gather
        # (bit-exact; the vmapped per-sample gather lowers ~3.4x slower
        # per row — ops/memory_ops.py:memory_read_batched)
        egos = memory_read_batched(batch.mem_features, batch.mem_obs,
                                   batch.proj_indices) \
            if cfg.memory.reads_memory() else None
        losses = jax.vmap(one_frame,
                          in_axes=(0, 0, 0, 0, 0, 0, 0, 0,
                                   None if egos is None else 0))(
            batch.image, batch.proj_indices,
            batch.mem_features, batch.mem_obs,
            batch.gt_boxes, batch.gt_classes,
            batch.gt_valid, keys, egos)
        # summed losses divide by the reference normalizer when provided
        # (n_chunks * first-chunk frames, custom_rcnn.py:541-544 — equal to
        # the valid-frame count except for ragged chunks); padding rows
        # carry weight 0 either way
        wsum = jnp.maximum(jnp.sum(batch.weight), 1.0)
        norm = wsum if batch.loss_norm is None else \
            jnp.maximum(jnp.mean(batch.loss_norm), 1.0)
        # CenterNet focal/reg losses are normalized by the batch-GLOBAL mean
        # positive/regression counts — the reference's cross-GPU reduce_sum
        # semantics (centernet.py:258-265, 291-293). Under jit over the
        # data-sharded batch these means ARE cross-device: XLA inserts the
        # all-reduce from the sharding, exactly where NCCL reduce_sum sat.
        num_pos_avg = jnp.maximum(
            jnp.sum(losses.pop("_centernet_num_pos") * batch.weight) / wsum, 1.0)
        reg_norm = jnp.maximum(
            jnp.sum(losses.pop("_centernet_reg_cnt") * batch.weight) / wsum, 1.0)
        losses = {k: jnp.sum(v * batch.weight) / norm for k, v in losses.items()}
        losses["loss_centernet_agn_pos"] /= num_pos_avg
        losses["loss_centernet_agn_neg"] /= num_pos_avg
        losses["loss_centernet_loc"] /= reg_norm
        total = sum(losses.values())
        return total, losses

    def init_state(params) -> Tuple[TrainState, Any]:
        nonlocal tx
        if tx is None:
            tx = build_optimizer(params, cfg.solver)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32)), tx

    def step_fn(state: TrainState, batch: TrainBatch, zs_weight
                ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, zs_weight, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        losses["total_loss"] = total
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), losses

    step_fn.loss_fn = loss_fn       # exposed for equality/normalization tests
    return init_state, step_fn


def make_caption_train_step(model: EmbodiedDetector, cfg: DetectorConfig,
                            caption_weight: float = 1.0,
                            neg_cap_weight: float = 0.125):
    """Caption co-training step with GLOBAL-batch negatives.

    ref: CustomRCNN ann_type='caption' (custom_rcnn.py:188-278) +
    `_sync_caption_features` (:294-307), which all_gathers every rank's
    caption features so each image's contrastive loss sees the full global
    batch as negatives. TPU-native: under jit over the data-sharded batch,
    the [B_global, D] caption matrix IS the global set — XLA inserts the
    all_gather from the sharding annotations; no collective code.

    Returns loss_fn(params, images [B,H,W,3], caption_features [B,D],
    weight [B]) -> (total, aux)."""
    from ..models.losses import caption_loss

    def loss_fn(params, images, caption_features, weight, step=0):
        # train=True + per-frame drop_path rngs: the reference runs every
        # co-training forward under model.train(), so swin stochastic depth
        # is active on caption batches too (no-op for the R50 trunk)
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(23), step),
            images.shape[0])
        embs = jax.vmap(lambda im, k: model.apply(
            params, im, train=True,
            method=EmbodiedDetector.image_box_embedding,
            rngs={"drop_path": k}))(images, keys)
        b = images.shape[0]

        def per_frame(i):
            return caption_loss(embs[i][None], caption_features, i,
                                cfg.roi.norm_temperature, neg_cap_weight,
                                caption_valid=weight > 0)
        losses = jax.vmap(per_frame)(jnp.arange(b))
        # normalize by the FULL batch size B, not the count of images that
        # have a caption — the reference accumulates per image and divides
        # by B at the end (detic_fast_rcnn.py:418-422), so caption-less
        # rows (weight 0) still count in the denominator
        total = caption_weight * jnp.sum(losses * weight) / float(b)
        return total, {"caption_loss": total}

    return loss_fn


def make_captiontag_train_step(model: EmbodiedDetector, cfg: DetectorConfig,
                               caption_weight: float = 1.0,
                               neg_cap_weight: float = 0.125,
                               variant: str = "max_size",
                               image_loss_weight: float = 0.1):
    """'captiontag' sources apply BOTH the caption contrastive loss and the
    image-label tag loss.

    ref: detic_fast_rcnn.py:370-375 — only ann_type=='caption' skips the tag
    loop, so captiontag batches (e.g. cc3m_v1_train_tags) get the caption
    loss AND the per-stage image-label BCE. Both losses share ONE backbone
    forward per image (the reference derives the caption score and the tag
    BCE from the same head pass, custom_rcnn.py:188-278) — frame_train_weak
    returns the stage-0 image-box CLIP embedding alongside the tag losses.

    Returns loss_fn(params, images [B,H,W,3], caption_features [B,D],
    weight [B], labels [B,L], labels_valid [B,L], zs_weight) ->
    (total, aux). `weight` is 0 for images whose caption list was empty
    (they still get tag supervision); `frame_valid` (default all-True)
    marks batch-divisibility padding rows, which get NEITHER loss."""
    from ..models.losses import caption_loss

    def loss_fn(params, images, caption_features, weight, labels,
                labels_valid, zs_weight, step=0, frame_valid=None):
        b = images.shape[0]
        if frame_valid is None:
            frame_valid = jnp.ones((b,), bool)
        fv = frame_valid.astype(jnp.float32)

        def one_frame(img, lab, lv, key):
            l, emb = model.apply(params, img, zs_weight, lab, lv,
                                 method=EmbodiedDetector.frame_train_weak,
                                 variant=variant,
                                 image_loss_weight=image_loss_weight,
                                 train=True, return_image_box_embedding=True,
                                 rngs={"drop_path": key})
            return sum(l.values()), emb

        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(29), step), b)
        tags, embs = jax.vmap(one_frame)(images, labels, labels_valid, keys)

        cap_valid = (weight > 0) & frame_valid
        def per_frame(i):
            return caption_loss(embs[i][None], caption_features, i,
                                cfg.roi.norm_temperature, neg_cap_weight,
                                caption_valid=cap_valid)
        cap_losses = jax.vmap(per_frame)(jnp.arange(b))
        cw = weight * fv
        # both losses normalize by the FULL batch size B — the reference
        # divides the accumulated sums by B regardless of how many images
        # actually contributed (detic_fast_rcnn.py:418-422). Only
        # batch-divisibility padding rows (frame_valid False) are excluded
        # from B; they are synthetic duplicates, not batch images.
        b_real = jnp.maximum(jnp.sum(fv), 1.0)
        cap_total = caption_weight * jnp.sum(cap_losses * cw) / b_real

        # tag supervision applies to every VALID captiontag image with
        # labels, even ones whose caption list was empty (weight==0): the
        # reference skips the tag loop only for ann_type=='caption'
        # (detic_fast_rcnn.py:370-375), not for caption-less images.
        tag_w = jnp.any(labels_valid, axis=1).astype(tags.dtype) * fv
        tag_total = jnp.sum(tags * tag_w) / b_real
        total = cap_total + tag_total
        return total, {"caption_loss": cap_total, "tag_loss": tag_total}

    return loss_fn


def jit_train_step(step_fn, mesh: Mesh):
    """Compile step_fn with params/state replicated; batch sharding is taken
    ENTIRELY from the committed input arrays — commit them with
    parallel.mesh.shard_batch(mesh, batch, axis=cfg.parallel.data_axis).
    XLA inserts the gradient all-reduce over ICI."""
    replicated = NamedSharding(mesh, P())
    return jax.jit(step_fn, out_shardings=(replicated, replicated),
                   donate_argnums=(0,))
