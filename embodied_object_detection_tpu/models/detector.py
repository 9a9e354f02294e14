"""The embodied detector meta-architecture.

ref: CustomRCNN / CustomRCNNRecurrent (Detic/detic/modeling/meta_arch/
custom_rcnn.py:80-331, 333-1081). The reference drives a serial Python loop
over frames with mutable module state (self.semmap_features / implicit_memory,
custom_rcnn.py:441-546); here one frame is a pure function

    params x frame x MemoryState -> detections x MemoryState'

and an episode is `jax.lax.scan` over frames, so a whole 20-frame chunk
compiles into one XLA program with zero host round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import DetectorConfig
from ..ops.mask_paste import paste_masks
from ..ops.memory_ops import memory_read, memory_write, MemoryWriteResult
from ..ops.nms import multiclass_nms
from ..structures import Detections, MemoryState
from .centernet import CenterNetHead, decode_proposals
from .fpn import RecurrentFPN
from .resnet import ResNet50
from .roi_heads import CascadeROIHeads, CascadeOutputs, apply_deltas


def grad_scale(x, s):
    """Forward identity, backward x s — the _ScaleGradient analog
    (detic_roi_heads.py:333, 1/num_stages per cascade stage). ONE
    definition shared by the strong and weak train paths: the scale
    semantics are parity-load-bearing in both."""
    return x * s + jax.lax.stop_gradient(x) * (1.0 - s)


class FrameInputs(NamedTuple):
    """One frame of an episode (padded, fixed shapes).

    ref: the per-frame dict assembled by map_mp3d_batch_to_coco
    (train_mp3d.py:452-507) + SMNetDetectionLoader (loader.py:296-303).
    """
    image: jax.Array           # [H, W, 3] float32 RGB (0..255, unnormalized)
    proj_indices: jax.Array    # [H, W] int32 flattened map-cell index
    outlier_mask: jax.Array    # [H, W] bool invalid projections
    # host-precomputed per-frame cell visibility (1.0 where any pixel maps to
    # the cell; np.bincount(proj)>0) — a pure function of proj_indices that
    # costs 2 ms/frame as a device scatter but ~1 ms of idle host time
    obs_visibility: jax.Array  # [max_cells] float32
    memory_reset: jax.Array    # [] bool — reset memory before this frame
    episode_start: jax.Array   # [] bool — first frame of an episode chunk
    # [] bool — False for rows padding a short chunk to t_max; padding
    # frames never touch the carried memory (the reference never feeds
    # them to the model at all). None (pytree-empty) = all frames valid.
    frame_valid: "jax.Array | None" = None


class FrameOutputs(NamedTuple):
    detections: Detections           # [300] final per-frame detections
    proposals: Detections            # [256] CenterNet proposals
    write: MemoryWriteResult
    write_boxes: jax.Array           # [K, 4] boxes fed to the memory write
    write_valid: jax.Array           # [K]


class EmbodiedDetector(nn.Module):
    """backbone + FPN(+memory fusion) + CenterNet + cascade heads.

    Equivalent of detectron2 build_model for META_ARCHITECTURE
    CustomRCNNRecurrent with BACKBONE build_p67_timm_fpn_backbone_recurrent
    (train_mp3d.py:700, timm.py:507-531).
    """
    cfg: DetectorConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        if self.cfg.backbone.name == "swin_b":
            from .swin import SwinTransformer
            self.backbone = SwinTransformer(
                dtype=dtype,
                drop_path_rate=self.cfg.backbone.drop_path_rate,
                name="backbone")
        else:
            self.backbone = ResNet50(depths=self.cfg.backbone.depths,
                                     dtype=dtype, name="backbone")
        self.fpn = RecurrentFPN(
            out_channels=self.cfg.backbone.fpn_channels,
            feat_fusion=self.cfg.memory.feat_fusion,
            map_feature_weight=self.cfg.memory.map_feature_weight,
            dtype=dtype, name="fpn")
        self.centernet = CenterNetHead(
            num_levels=len(self.cfg.centernet.strides),
            in_channels=self.cfg.backbone.fpn_channels,
            num_box_convs=self.cfg.centernet.num_box_convs,
            prior_prob=self.cfg.centernet.prior_prob,
            dtype=dtype, name="centernet")
        self.roi_heads = CascadeROIHeads(self.cfg.roi, dtype=dtype,
                                         name="roi_heads")
        if self.cfg.roi.with_softmax_prop:
            from .roi_heads import SoftmaxPropHead
            self.prop_score_heads = tuple(
                SoftmaxPropHead(self.cfg.roi.num_classes,
                                name=f"prop_score{k}")
                for k in range(len(self.cfg.roi.cascade_ious)))

    # ---------------------------------------------------------------- utils
    def _normalize(self, image: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.cfg.input.pixel_mean, jnp.float32)
        std = jnp.asarray(self.cfg.input.pixel_std, jnp.float32)
        return (image - mean) / std

    def _features(self, image: jax.Array, ego_memory: Optional[jax.Array],
                  train: bool = False):
        c3, c4, c5 = self.backbone_raw(image, train)
        return self.fpn(c3, c4, c5, ego_memory)

    def backbone_raw(self, image: jax.Array, train: bool = False):
        """normalize + trunk -> (C3, C4, C5). Memory-independent: fusion
        happens in the FPN (timm.py:142-192), so the trunk can run batched
        over a chunk's frames OUTSIDE the serial episode scan
        (make_episode_runner precompute_backbone) — the batched convs use
        the MXU better than the scan's batch-1 trunk (measured 0.90 vs
        1.26 ms/frame on v5e, tools/measure_backbone_batching.py).
        `train` activates swin stochastic depth (needs a 'drop_path' rng);
        the R50 trunk has no train-mode behavior (FrozenBN)."""
        x = self._normalize(image)
        if self.cfg.backbone.name == "swin_b":
            return self.backbone(x, train)
        return self.backbone(x)

    # ------------------------------------------------------------ inference
    def frame_step(self, image: jax.Array, zs_weight: jax.Array,
                   mem_features: jax.Array, mem_obs: jax.Array,
                   proj_indices: jax.Array, outlier_mask: jax.Array,
                   obs_visibility: "jax.Array | None" = None,
                   backbone_feats: "tuple | None" = None
                   ) -> FrameOutputs:
        """Full single-frame inference + memory write proposal computation.

        ref: CustomRCNNRecurrent.inference (custom_rcnn.py:548-582) +
        update_implicit_memory (:681-760). `backbone_feats` (C3, C4, C5)
        skips the trunk when it was precomputed outside the scan.
        """
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width

        # implicit_memory: recurrent map (read fused in the FPN). External
        # GT-memory baselines (semantic_gt / map_gt / explicit_map,
        # ref: loader.py:233-246): the "memory" is a fixed table (CLIP class
        # embeddings or a precomputed map) read through the same gather path.
        use_memory = cfg.memory.reads_memory()
        ego = memory_read(mem_features, mem_obs, proj_indices) if use_memory else None
        if backbone_feats is None:
            backbone_feats = self.backbone_raw(image)
        c3, c4, c5 = backbone_feats
        p3, p4, p5, p6, p7 = self.fpn(c3, c4, c5, ego)

        # proposals (ref: CenterNet.inference, centernet.py:603-632)
        agn_hms, regs = self.centernet((p3, p4, p5, p6, p7))
        proposals = decode_proposals(agn_hms, regs, cfg.centernet, training=False)

        # cascade heads (ref: detic_roi_heads.py:88-222)
        cascade = self.roi_heads.run_cascade((p3, p4, p5), proposals, zs_weight,
                                             (h, w))
        # mult_proposal_score: scores = sqrt(mean_sigmoid * objectness)
        # (ref: detic_roi_heads.py:171-173)
        scores = cascade.mean_scores
        if cfg.roi.mult_proposal_score:
            scores = jnp.sqrt(scores * jnp.maximum(proposals.scores[:, None], 0.0))
        if cfg.roi.one_class_per_proposal:  # demo knob (robot_demo.py:357-359)
            fg = scores[:, :-1]
            best = jnp.max(fg, axis=1, keepdims=True)
            scores = scores * (scores == best).astype(scores.dtype)

        detections, _ = multiclass_nms(
            cascade.final_boxes, scores, proposals.valid,
            cfg.roi.score_thresh_test, cfg.roi.nms_thresh_test,
            cfg.roi.detections_per_image)

        external = cfg.memory.external_memory()
        if cfg.memory.write_memory and not external:
            write, wboxes, wvalid = self._memory_write(
                proposals, cascade, zs_weight, (p3, p4, p5), proj_indices,
                obs_visibility)
        else:
            write = MemoryWriteResult(
                features_update=jnp.zeros_like(mem_features),
                obs_update=jnp.zeros_like(mem_obs),
                any_detection=jnp.asarray(False))
            k = cfg.memory.write_topk
            wboxes = jnp.zeros((k, 4), jnp.float32)
            wvalid = jnp.zeros((k,), bool)

        return FrameOutputs(detections=detections, proposals=proposals,
                            write=write, write_boxes=wboxes, write_valid=wvalid)

    def _memory_write(self, proposals: Detections, cascade: CascadeOutputs,
                      zs_weight: jax.Array, features, proj_indices,
                      obs_visibility=None
                      ) -> Tuple[MemoryWriteResult, jax.Array, jax.Array]:
        """Select proposals for the memory write, run the mask head on them,
        splat + scatter (ref: update_implicit_memory / inference_with_proposals
        / box_to_image_features / project_image_features,
        custom_rcnn.py:681-936).
        """
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        k = cfg.memory.write_topk

        # boxes/feats handed to the write are the ORIGINAL stage-0 proposals:
        # DeticCascadeROIHeads.forward returns the input Instances unchanged
        # (_forward_box rebinds `proposals` to fresh Instances for k>0,
        # detic_roi_heads.py:108-115, so only _run_stage at k=0 sets .feat on
        # the originals, :341-346). inference_with_proposals
        # (custom_rcnn.py:827-829) therefore reads UNREGRESSED CenterNet
        # boxes + stage-0 CLIP embeddings, and forward_mask_memory
        # (custom_rcnn.py:573) pools masks on those same boxes.
        boxes = cascade.stages[0].boxes
        feats = cascade.stages[0].clip_feats             # 50 * l2-normalized
        obj = proposals.scores

        # training-time GT filter: drop injected GT proposals (score >= 1)
        # ref: custom_rcnn.py:837-844
        valid = proposals.valid & (obj < 1.0)

        # write scores: sqrt(sigmoid(stage-0 logits) * proposal score).
        # sigmoid(feat @ zs_weight) equals sigmoid(stage-0 logits) since
        # the write recomputes 50*normalize(feat) @ zs with no bias
        # (custom_rcnn.py:846-853). The proposal-score multiply is
        # UNCONDITIONAL (:853-855 has no mult_proposal_score branch — the
        # knob gates detection scoring only, detic_roi_heads.py:94-99).
        sig = jax.nn.sigmoid(cascade.stages[0].logits)
        wscores = jnp.sqrt(sig * jnp.maximum(obj[:, None], 0.0))

        _, rows = multiclass_nms(boxes, wscores, valid,
                                 cfg.memory.cls_score_thresh,
                                 cfg.memory.write_nms_thresh, k)

        # unique kept proposal rows (ref: custom_rcnn.py:875) — scatter into a
        # per-row flag, then take up to K rows in ascending row order. Invalid
        # NMS slots (-1) are remapped out of range and dropped so they cannot
        # collide with a genuine keep of row 0.
        r = boxes.shape[0]
        row_kept = jnp.zeros((r,), bool).at[
            jnp.where(rows >= 0, rows, r)].set(True, mode="drop")
        key = row_kept.astype(jnp.float32) * (2.0 - jnp.arange(r) / r)
        # shape-robust to write_topk > num proposals: pad candidates with
        # valid=False rows instead of letting top_k crash on k > N
        pad = max(0, k - r)
        if pad:
            key = jnp.pad(key, (0, pad))
            row_kept = jnp.pad(row_kept, (0, pad))
        _, sel = jax.lax.top_k(key, k)
        wvalid = row_kept[sel]
        sel = jnp.minimum(sel, r - 1)
        wboxes = boxes[sel]
        wfeats = feats[sel]

        # mask head only on the <=K selected rows (the reference runs it on
        # all 256 proposals — forward_mask_memory, custom_rcnn.py:573 — which
        # is redundant work; results are identical per-ROI).
        mask_logits = self.roi_heads.mask_logits(features, wboxes)
        mask_probs = jax.nn.sigmoid(mask_logits)

        s = cfg.memory.pixel_subsample
        if cfg.memory.exact_write_subsample:
            # pixel-major paste + per-row compacted exact write (bit-exact
            # reference ::8-of-compacted-observed selection; r5 A/B measured
            # this FASTER than the legacy strided approximation — see
            # ops/memory_ops.py and the ARCHITECTURE.md write-path study)
            masks = paste_masks(mask_probs, wboxes, h, w,
                                cfg.memory.mask_thresh, pixel_major=True)
            write = memory_write(wfeats, masks, wvalid, proj_indices,
                                 num_cells=cfg.memory.max_cells,
                                 subsample=s, exact_subsample=True,
                                 obs_visibility=obs_visibility,
                                 pixel_major=True)
        else:
            # fast path: paste + scatter on the static stride-s column grid
            # (row-major flat stride s == column stride s when W % s == 0)
            masks = paste_masks(mask_probs, wboxes, h, w,
                                cfg.memory.mask_thresh, x_stride=s)
            write = memory_write(wfeats, masks, wvalid,
                                 proj_indices[:, ::s],
                                 num_cells=cfg.memory.max_cells,
                                 subsample=1, exact_subsample=False,
                                 obs_proj_indices=proj_indices,
                                 obs_visibility=obs_visibility)
        return write, wboxes, wvalid

    # -------------------------------------------------------------- training
    def frame_train(self, image: jax.Array, zs_weight: jax.Array,
                    mem_features: jax.Array, mem_obs: jax.Array,
                    proj_indices: jax.Array, gt,
                    sample_rng: "jax.Array | None" = None,
                    defer_centernet_norm: bool = False,
                    fed_freq_weight: "jax.Array | None" = None,
                    ego: "jax.Array | None" = None) -> dict:
        """Per-frame training losses.

        ref: CustomRCNNRecurrent training branch (custom_rcnn.py:444-464 +
        forward_model :584-679). Training reads *precomputed* memory (loaded
        from SEMMAP_PATH h5 snapshots, loader.py:216-227) — it never writes
        memory online, so frames are independent and batchable (no scan).
        The reference's training-time mask forward on proposals
        (custom_rcnn.py:652-653) is dead compute (outputs unused) and is
        omitted; the mask loss is zero for mp3d data which has no GT masks
        (detic_roi_heads.py:248-251 -> _get_empty_mask_loss).

        With `defer_centernet_norm`, the CenterNet entries are returned as
        RAW weighted sums plus `_centernet_num_pos`/`_centernet_reg_cnt`
        counts so the batch step can normalize by the batch-GLOBAL mean
        counts — the reference's cross-GPU reduce_sum semantics
        (centernet.py:258-265, 291-293). Without it, the per-frame local
        counts are used (single-frame/world-size-1 semantics).
        """
        from .losses import (add_gt_to_proposals, centernet_targets,
                             centernet_raw_losses, centernet_normalize,
                             match_proposals, stage_losses)
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width

        # same memory-type set as frame_step: the GT-memory baselines
        # (semantic_gt / map_gt / explicit_map) must TRAIN through the
        # fusion convs they evaluate through, or the merge projections
        # stay random while eval routes the table through them.
        # A caller batching frames may pass a precomputed `ego` (one flat
        # memory_read_batched gather over the batch — vmapping the read in
        # here lowers a ~3.4x slower batched gather; ops/memory_ops.py).
        use_memory = cfg.memory.reads_memory()
        if ego is None:
            ego = memory_read(mem_features, mem_obs, proj_indices) \
                if use_memory else None
        if cfg.backbone.train_remat:
            # trade recompute for activation bytes on the memory-bound step
            feats_fn = nn.remat(type(self)._features, static_argnums=(3,))
            p3, p4, p5, p6, p7 = feats_fn(self, image, ego, True)
        else:
            p3, p4, p5, p6, p7 = self._features(image, ego, train=True)
        feats = (p3, p4, p5, p6, p7)

        agn_hms, regs = self.centernet(feats)
        shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
        targets = centernet_targets(gt, shapes, cfg.centernet)
        agn_flat = jnp.concatenate([x.reshape(-1) for x in agn_hms])
        reg_flat = jnp.concatenate([x.reshape(-1, 4) for x in regs])
        if cfg.centernet.more_pos:
            # ref: centernet.py:203-208 — replace the peak positives with the
            # loss-selected center-3x3 set
            from .losses import add_more_pos
            mp = add_more_pos(reg_flat, gt, shapes, cfg.centernet)
        else:
            mp = None
        raw = centernet_raw_losses(agn_flat, reg_flat, targets,
                                   cfg.centernet, more_pos=mp)
        if defer_centernet_norm:
            losses = {
                "loss_centernet_agn_pos": raw.pos,
                "loss_centernet_agn_neg": raw.neg,
                "loss_centernet_loc": raw.loc,
                "_centernet_num_pos": raw.num_pos,
                "_centernet_reg_cnt": raw.reg_cnt,
            }
        else:
            losses = centernet_normalize(raw, raw.num_pos, raw.reg_cnt)

        proposals = decode_proposals(agn_hms, regs, cfg.centernet,
                                     training=True)
        # ref: label_and_sample_proposals (detic_roi_heads.py:236-238):
        # GT boxes appended, then the proposal set is subsampled to
        # batch_size_per_image (512) with positive_fraction (0.25) BEFORE
        # any pooling — pooling all post-NMS train proposals (2000) would
        # be both unfaithful and ~4x the cascade's ROIAlign cost.
        proposals = add_gt_to_proposals(proposals, gt)
        from ..structures import clip_boxes as _clip, nonempty as _nonempty
        # stage-0 boxes stay unclipped (reference pools/regresses raw boxes)
        boxes = jax.lax.stop_gradient(proposals.boxes)
        valid = proposals.valid
        bsz = cfg.roi.batch_size_per_image
        if bsz and boxes.shape[0] > bsz:
            from .losses import sample_proposals
            if sample_rng is None:
                sample_rng = jax.random.PRNGKey(0)
            m0 = match_proposals(boxes, valid, gt, cfg.roi.cascade_ious[0],
                                 cfg.roi.num_classes)
            fg = (m0.gt_classes < cfg.roi.num_classes) & m0.valid
            idx, keep = sample_proposals(valid, fg, bsz,
                                         cfg.roi.positive_fraction,
                                         sample_rng)
            boxes = jnp.take(boxes, idx, axis=0)
            valid = jnp.take(valid, idx) & keep

        num_stages = len(cfg.roi.cascade_ious)
        matched = match_proposals(boxes, valid, gt, cfg.roi.cascade_ious[0],
                                  cfg.roi.num_classes)
        # federated loss (USE_FED_LOSS + CAT_FREQ_PATH weights): each stage
        # draws its own class sample, as each reference losses() call invokes
        # get_fed_loss_inds anew (detic_fast_rcnn.py:214-218). No freq table
        # -> no masking, matching `self.freq_weight is not None` (:214).
        use_fed = cfg.roi.use_fed_loss and fed_freq_weight is not None
        use_izc = cfg.roi.ignore_zero_cats and fed_freq_weight is not None
        zero_cat_w = None
        if use_izc:
            # ref: detic_fast_rcnn.py:225-228 (sigmoid: multiplies into the
            # fed mask) / :244-251 (softmax: takes precedence over fed)
            zero_cat_w = (fed_freq_weight[:cfg.roi.num_classes] > 1e-4) \
                .astype(jnp.float32)
        if use_fed:
            from .losses import fed_loss_class_weight
            fed_rng = sample_rng if sample_rng is not None \
                else jax.random.PRNGKey(0)
        def _stage_fwd(mdl, feats3, stage_boxes, zsw, k):
            pooled = mdl.roi_heads._pool(feats3, stage_boxes,
                                         cfg.roi.pooler_resolution)
            pooled = grad_scale(pooled, 1.0 / num_stages)
            x = mdl.roi_heads.box_heads[k](pooled)
            return mdl.roi_heads.predictors[k](x, zsw)

        stage_fwd = nn.remat(_stage_fwd, static_argnums=(4,)) \
            if cfg.roi.train_stage_remat else _stage_fwd

        for k in range(num_stages):
            if k > 0:
                boxes = _clip(jax.lax.stop_gradient(prev_boxes), h, w)
                valid = valid & _nonempty(boxes)
                matched = match_proposals(boxes, valid, gt,
                                          cfg.roi.cascade_ious[k],
                                          cfg.roi.num_classes)
            logits, deltas, _ = stage_fwd(self, (p3, p4, p5), boxes,
                                          zs_weight, k)
            class_weight = fed_loss_class_weight(
                matched.gt_classes, matched.valid, fed_freq_weight,
                cfg.roi.fed_loss_num_cat, cfg.roi.num_classes,
                jax.random.fold_in(fed_rng, 101 + k)) if use_fed else None
            if use_izc:
                if not cfg.roi.use_sigmoid_ce:
                    class_weight = zero_cat_w      # if/elif: izc wins
                elif class_weight is None:
                    class_weight = zero_cat_w
                else:
                    class_weight = class_weight * zero_cat_w
            sl = stage_losses(logits, deltas, matched,
                              cfg.roi.cascade_bbox_reg_weights[k],
                              cfg.roi.num_classes,
                              class_weight=class_weight,
                              use_sigmoid_ce=cfg.roi.use_sigmoid_ce)
            losses.update({f"{n}_stage{k}": v for n, v in sl.items()})
            prev_boxes = apply_deltas(deltas, boxes,
                                      cfg.roi.cascade_bbox_reg_weights[k])
        return losses

    def frame_step_debug(self, image: jax.Array, zs_weight: jax.Array,
                         mem_features: jax.Array, mem_obs: jax.Array,
                         proj_indices: jax.Array, outlier_mask: jax.Array
                         ) -> dict:
        """Extended single-frame outputs for parity diffing.

        Formalizes the reference's prompt_learning/temp dump channel
        (zero_shot_classifier.py:91-100, detic_roi_heads.py:182-212,
        SURVEY.md §4c): per-stage proposal boxes, region embeddings and
        sigmoid scores, plus proposals/objectness and final detections —
        everything needed to diff activations against another implementation.
        """
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        use_memory = cfg.memory.reads_memory()
        ego = memory_read(mem_features, mem_obs, proj_indices) if use_memory else None
        p3, p4, p5, p6, p7 = self._features(image, ego)
        agn_hms, regs = self.centernet((p3, p4, p5, p6, p7))
        proposals = decode_proposals(agn_hms, regs, cfg.centernet,
                                     training=False)
        cascade = self.roi_heads.run_cascade((p3, p4, p5), proposals,
                                             zs_weight, (h, w))
        scores = cascade.mean_scores
        if cfg.roi.mult_proposal_score:
            scores = jnp.sqrt(scores * jnp.maximum(proposals.scores[:, None], 0.0))
        detections, _ = multiclass_nms(
            cascade.final_boxes, scores, proposals.valid,
            cfg.roi.score_thresh_test, cfg.roi.nms_thresh_test,
            cfg.roi.detections_per_image)
        out = {
            "proposal_boxes": proposals.boxes,
            "objectness": proposals.scores,
            "proposal_valid": proposals.valid,
            "final_boxes": detections.boxes,
            "final_scores": detections.scores,
            "final_classes": detections.classes,
            "final_valid": detections.valid,
        }
        for k, st in enumerate(cascade.stages):
            out[f"stage{k}_boxes"] = st.boxes
            out[f"stage{k}_region_embeddings"] = st.clip_feats
            out[f"stage{k}_scores"] = jax.nn.sigmoid(st.logits)
        return out

    def frame_train_weak(self, image: jax.Array, zs_weight: jax.Array,
                         labels: jax.Array, labels_valid: jax.Array,
                         variant: str = "max_size",
                         image_loss_weight: float = 0.1,
                         ws_num_props: int = 128,
                         image_box_size: float = 1.0,
                         train: bool = False,
                         return_image_box_embedding: bool = False):
        """Image-label weak supervision (the Detic co-training path).

        ref: CustomRCNN.forward with ann_type='image' (custom_rcnn.py:188-278)
        + DeticCascadeROIHeads.get_top_proposals/_add_image_box
        (detic_roi_heads.py:239, 271-295) + image_label_losses
        (detic_fast_rcnn.py:342-434). Proposal losses are zeroed for
        image-labeled data (custom_rcnn.py:262-266); the selected-proposal BCE
        is applied per cascade stage.
        """
        from .losses import image_label_loss
        from ..structures import clip_boxes as _clip, nonempty as _nonempty
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        # train=True activates swin drop-path — the reference trains with
        # model.train() global on every co-training forward, not just the
        # box-supervised one (needs a 'drop_path' rng for swin trunks)
        p3, p4, p5, p6, p7 = self._features(image, None, train=train)
        agn_hms, regs = self.centernet((p3, p4, p5, p6, p7))
        proposals = decode_proposals(agn_hms, regs, cfg.centernet,
                                     training=True)
        # top ws_num_props + whole-image box appended last
        k = min(ws_num_props, proposals.boxes.shape[0])
        boxes = _clip(jax.lax.stop_gradient(proposals.boxes[:k]), h, w)
        valid = proposals.valid[:k]
        f = image_box_size
        img_box = jnp.asarray([[w * (1 - f) / 2, h * (1 - f) / 2,
                                w * (1 - (1 - f) / 2), h * (1 - (1 - f) / 2)]],
                              jnp.float32)
        boxes = jnp.concatenate([boxes, img_box], axis=0)
        valid = jnp.concatenate([valid, jnp.ones((1,), bool)], axis=0)

        losses = {}
        num_stages = len(cfg.roi.cascade_ious)
        # grad_scale applies in _run_stage for EVERY ann_type
        # (detic_roi_heads.py:333) — without it the weak losses backprop
        # num_stages x the reference gradient into the FPN/backbone

        cur = boxes
        image_box_emb = None
        for s in range(num_stages):
            if s > 0:
                # the reference drops empty boxes in every TRAINING forward,
                # weak ann_types included (_create_proposals_from_boxes
                # nonempty filter, detic_roi_heads.py:314-318)
                valid = valid & _nonempty(cur)
            pooled = self.roi_heads._pool((p3, p4, p5), cur,
                                          cfg.roi.pooler_resolution)
            pooled = grad_scale(pooled, 1.0 / num_stages)
            x = self.roi_heads.box_heads[s](pooled)
            logits, deltas, clip_feats = self.roi_heads.predictors[s](
                x, zs_weight)
            if s == 0:
                # stage-0 CLIP feature of the appended whole-image box (last
                # row) — the caption region embedding, identical to
                # image_box_embedding but sharing THIS forward so captiontag
                # co-training doesn't pay a second trunk pass
                image_box_emb = clip_feats[-1]
            prop_logits = None
            if variant in ("wsddn", "wsod"):
                assert cfg.roi.with_softmax_prop, \
                    "wsddn needs roi.with_softmax_prop=True"
                prop_logits = self.prop_score_heads[s](x)
            losses[f"image_loss_stage{s}"] = image_label_loss(
                logits, cur, valid, labels, labels_valid,
                cfg.roi.num_classes, variant=variant,
                image_loss_weight=image_loss_weight,
                prop_logits=prop_logits)
            cur = _clip(jax.lax.stop_gradient(apply_deltas(
                deltas, cur, cfg.roi.cascade_bbox_reg_weights[s])), h, w)
        if return_image_box_embedding:
            return losses, image_box_emb
        return losses

    def image_box_embedding(self, image: jax.Array,
                            image_box_size: float = 1.0,
                            train: bool = False) -> jax.Array:
        """CLIP-space embedding of the whole-image box — the caption region.

        ref: the caption path scores `score[-1:]` (the appended image box,
        detic_fast_rcnn.py:477 / _add_image_box detic_roi_heads.py:271-295)
        through the stage-0 zero-shot head's 512-d projection. train=True
        activates swin drop-path (see frame_train_weak)."""
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        p3, p4, p5, p6, p7 = self._features(image, None, train=train)
        f = image_box_size
        box = jnp.asarray([[w * (1 - f) / 2, h * (1 - f) / 2,
                            w * (1 - (1 - f) / 2), h * (1 - (1 - f) / 2)]],
                          jnp.float32)
        pooled = self.roi_heads._pool((p3, p4, p5), box,
                                      cfg.roi.pooler_resolution)
        x = self.roi_heads.box_heads[0](pooled)
        zs_dummy = jnp.zeros((cfg.roi.zs_weight_dim, 1), jnp.float32)
        _, _, feat = self.roi_heads.predictors[0](x, zs_dummy)
        return feat[0]

    # ------------------------------------------------- single-frame, no mem
    def __call__(self, image: jax.Array, zs_weight: jax.Array,
                 mem_features: jax.Array, mem_obs: jax.Array,
                 proj_indices: jax.Array, outlier_mask: jax.Array):
        """Init/inspection entry — exercises every parameterized path."""
        out = self.frame_step(image, zs_weight, mem_features, mem_obs,
                              proj_indices, outlier_mask)
        if self.cfg.roi.with_softmax_prop:
            # materialize the wsddn prop-score heads at init (frame_step
            # doesn't touch them)
            x = jnp.zeros((1, self.cfg.roi.fc_dim), jnp.float32)
            for head in self.prop_score_heads:
                head(x)
        return out


# =========================================================================
# Episode driver
# =========================================================================

class EpisodeOutputs(NamedTuple):
    detections: Detections       # [T, 300]
    memory: MemoryState          # final live memory
    any_detection: jax.Array     # [T]
    # memory right after the chunk's first frame — what TEST_SAVE_SEMMAP
    # snapshots per sequence (ref: custom_rcnn.py:518-530 saves at i==0)
    first_memory: MemoryState


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_episode_runner(model: EmbodiedDetector, cfg: DetectorConfig,
                        precompute_backbone: bool = True):
    """Build a jittable episode function.

    ref: CustomRCNNRecurrent.forward eval branch (custom_rcnn.py:466-539):
      * memory reset when frame.memory_reset (zeros, :470-479)
      * test_type 'default'/'episodic': the *read* memory tracks the live
        memory every frame (:489-491)
      * test_type 'longterm': the read memory is snapshotted only at episode
        starts (:482-486), so within an episode the model sees frozen memory
        while the live memory keeps accumulating
      * per-frame inference + memory write

    precompute_backbone: run the (memory-independent) ResNet trunk batched
    over all T frames BEFORE the serial scan — the batched convs use the
    MXU better than the scan's batch-1 trunk (0.90 vs 1.26 ms/frame
    measured on v5e); the scan then consumes (C3, C4, C5) as scan inputs.
    Identical math, re-associated; costs T x ~8.6 MB of HBM for the
    feature stash at 480x640. Pass "external" to get an episode function
    taking the trunk features as a FIFTH argument — see
    make_pipelined_episode_runner, which uses the split to enqueue
    chunk k+1's trunk against chunk k's scan.
    """
    test_type = cfg.memory.test_type
    # external GT-memory tables are constant: never reset, never written
    external_memory = cfg.memory.external_memory()

    def episode(params, frames: FrameInputs, zs_weight: jax.Array,
                init_memory: MemoryState,
                ext_feats=None) -> EpisodeOutputs:
        zeros = MemoryState.zeros(cfg.memory.max_cells, cfg.memory.memory_dim)

        def step(carry, inp):
            frame, feats = inp
            live, snap, first_mem, t = carry
            if external_memory:
                snap = live = carry[0]
            else:
                # padding frames must not reset either (producers that pad
                # by repeating a reset-bearing frame would wipe the carry)
                do_reset = frame.memory_reset if frame.frame_valid is None \
                    else frame.memory_reset & frame.frame_valid
                live = _tree_where(do_reset, zeros, live)
                snap = _tree_where(do_reset, zeros, snap)
                if test_type in ("default", "episodic"):
                    snap = live
                else:  # longterm
                    snap = _tree_where(frame.episode_start, live, snap)

            out = model.apply(params, frame.image, zs_weight, snap.features,
                              snap.obs_count, frame.proj_indices,
                              frame.outlier_mask, frame.obs_visibility,
                              backbone_feats=feats,
                              method=EmbodiedDetector.frame_step)
            if not external_memory:
                updated = MemoryState(
                    features=live.features + out.write.features_update,
                    obs_count=live.obs_count + out.write.obs_update)
                if frame.frame_valid is not None:
                    # padding frames must not contaminate the carry
                    live = _tree_where(frame.frame_valid, updated, live)
                else:
                    live = updated
            first_mem = _tree_where(t == 0, live, first_mem)
            return (live, snap, first_mem, t + 1), \
                (out.detections, out.write.any_detection)

        if precompute_backbone == "external":
            feats = ext_feats
        elif precompute_backbone:
            feats = jax.vmap(lambda im: model.apply(
                params, im, method=EmbodiedDetector.backbone_raw))(
                frames.image)
        else:
            feats = None
        (live, _, first_mem, _), (dets, any_det) = jax.lax.scan(
            step, (init_memory, init_memory, init_memory, jnp.int32(0)),
            (frames, feats))
        return EpisodeOutputs(detections=dets, memory=live,
                              any_detection=any_det, first_memory=first_mem)

    if precompute_backbone != "external":
        def episode4(params, frames, zs_weight, init_memory):
            return episode(params, frames, zs_weight, init_memory)
        return episode4
    return episode


def make_pipelined_episode_runner(model: EmbodiedDetector,
                                  cfg: DetectorConfig):
    """Split the episode into two jitted programs so the host can enqueue
    chunk k+1's batched trunk before chunk k's scan retires.

    The batched backbone precompute has no dependency on the memory carry
    (the only serial dependency is the carry itself, ref:
    custom_rcnn.py:470-501), so with two programs the async dispatch queue
    overlaps trunk(k+1) with scan(k) device-side. Returns
    (trunk_fn(params, images [T,H,W,3]) -> feats,
     scan_fn(params, frames, zs, memory, feats) -> EpisodeOutputs); both
    are plain jittable functions. Numerically identical to
    make_episode_runner — only the dispatch is re-ordered.
    """
    scan_fn = make_episode_runner(model, cfg, precompute_backbone="external")

    def trunk_fn(params, images):
        return jax.vmap(lambda im: model.apply(
            params, im, method=EmbodiedDetector.backbone_raw))(images)

    return trunk_fn, scan_fn


def make_batched_episode_runner(model: EmbodiedDetector, cfg: DetectorConfig):
    """vmap the episode runner over independent scene streams.

    The reference evaluates scenes strictly serially (train_mp3d.py:151); the
    recurrence only binds frames *within* a scene, so B scene streams run as
    one batched scan — this is where single-chip throughput scales past the
    serial protocol (MXU utilization at batch 1 is poor for 256-ROI heads).
    Inputs gain a leading [B] axis on frames and init_memory.
    """
    episode = make_episode_runner(model, cfg)
    return jax.vmap(episode, in_axes=(None, 0, None, 0))


def build_detector(cfg: Optional[DetectorConfig] = None,
                   rng: Optional[jax.Array] = None,
                   ) -> Tuple[EmbodiedDetector, Any]:
    """Construct the model and initialize parameters.

    Parameter shapes are independent of the input resolution / proposal
    capacities (convs are size-agnostic, the box-head FCs see the fixed
    pooled 7x7x256), so initialization traces a miniature config — a full
    480x640 frame-step trace just for init costs minutes on a slow link.
    """
    cfg = cfg or DetectorConfig()
    from ..config import validate_config
    validate_config(cfg)  # fail loudly on pinned-but-flipped knobs
    if getattr(cfg.roi, "head_type", "cascade") == "res5":
        # Res5ROIHeads variant (res5_roi_heads.py:20-172 analog)
        from .res5_detector import build_res5_detector
        return build_res5_detector(cfg, rng)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = EmbodiedDetector(cfg)

    icfg = cfg.replace(
        input=dataclasses.replace(cfg.input, height=64, width=96),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_test=32,
                                      post_nms_topk_test=8),
        roi=dataclasses.replace(cfg.roi, detections_per_image=4),
        memory=dataclasses.replace(cfg.memory, max_cells=32, write_topk=4),
    )
    init_model = EmbodiedDetector(icfg)
    h, w = icfg.input.height, icfg.input.width
    dummy = dict(
        image=jnp.zeros((h, w, 3), jnp.float32),
        zs_weight=jnp.zeros((icfg.roi.zs_weight_dim, icfg.roi.num_classes + 1),
                            jnp.float32),
        mem_features=jnp.zeros((icfg.memory.max_cells, icfg.memory.memory_dim),
                               jnp.float32),
        mem_obs=jnp.zeros((icfg.memory.max_cells,), jnp.float32),
        proj_indices=jnp.zeros((h, w), jnp.int32),
        outlier_mask=jnp.zeros((h, w), bool),
    )
    params = init_model.init(rng, **dummy)
    return model, params
