"""Torch re-derivation of the FULL recurrent frame (the parity capstone).

A from-scratch torch implementation of one embodied frame —
backbone -> FPN + memory fusion -> CenterNet proposals -> 3-stage cascade ->
final NMS -> mask head -> memory write — re-derived from the reference's
semantics (ref: CustomRCNNRecurrent.inference custom_rcnn.py:548-582 +
update_implicit_memory :681-760, CustomRecurrentFPN timm.py:91-213,
CenterNet centernet.py:603-745, DeticCascadeROIHeads detic_roi_heads.py:88-268),
NOT translated from either codebase's code. Weights are shared with the JAX
model exclusively through convert/torch_weights.py, so the test exercises the
converter, every layer, and every inter-op boundary in one chain.

Kept importable (no pytest dependency) so tools can drive it too.
"""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from test_torch_oracle_chains import (
    torch_greedy_nms, torch_apply_deltas, torch_memory_write_oracle)


# ---------------------------------------------------------------------------
# ROIAlign (torchvision CUDA `bilinear_interpolate` semantics, aligned=True)
# ---------------------------------------------------------------------------

def torch_roi_align_level(feat_hwc: torch.Tensor, boxes: torch.Tensor,
                          stride: float, output_size: int,
                          sampling_ratio: int = 2) -> torch.Tensor:
    """feat [H, W, C] (single level), boxes [R, 4] image coords ->
    [R, out, out, C]. Samples strictly outside [-1, size] contribute 0;
    in-range coords clamp to [0, size-1] (border band at full weight)."""
    h, w, c = feat_hwc.shape
    r = boxes.shape[0]
    s = sampling_ratio
    x1 = boxes[:, 0] / stride
    y1 = boxes[:, 1] / stride
    bin_w = (boxes[:, 2] / stride - x1) / output_size
    bin_h = (boxes[:, 3] / stride - y1) / output_size
    grid = (torch.arange(output_size * s, dtype=torch.float32) + 0.5) / s
    sx = x1[:, None] + grid[None, :] * bin_w[:, None] - 0.5      # [R, P]
    sy = y1[:, None] + grid[None, :] * bin_h[:, None] - 0.5
    sxx = sx[:, None, :].expand(r, output_size * s, output_size * s)
    syy = sy[:, :, None].expand(r, output_size * s, output_size * s)

    valid = (sxx >= -1.0) & (sxx <= w) & (syy >= -1.0) & (syy <= h)
    x = sxx.clamp(0.0, w - 1.0)
    y = syy.clamp(0.0, h - 1.0)
    x0 = torch.floor(x)
    y0 = torch.floor(y)
    lx, ly = x - x0, y - y0
    x0i = x0.long()
    y0i = y0.long()
    x1i = torch.minimum(x0i + 1, torch.tensor(w - 1))
    y1i = torch.minimum(y0i + 1, torch.tensor(h - 1))
    flat = feat_hwc.reshape(-1, c)
    ok = valid.float()

    def tap(yi, xi, wgt):
        return flat[(yi * w + xi).reshape(-1)].reshape(*yi.shape, c) \
            * wgt[..., None]

    vals = (tap(y0i, x0i, (1 - ly) * (1 - lx) * ok) +
            tap(y0i, x1i, (1 - ly) * lx * ok) +
            tap(y1i, x0i, ly * (1 - lx) * ok) +
            tap(y1i, x1i, ly * lx * ok))                         # [R, P, P, C]
    vals = vals.reshape(r, output_size, s, output_size, s, c)
    return vals.mean(dim=(2, 4))


def torch_multilevel_roi_align(feats_hwc, boxes, strides, output_size,
                               sampling_ratio=2, canonical_box_size=224,
                               canonical_level=4):
    """detectron2 assign_boxes_to_levels + per-ROI single-level align."""
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
           (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    lvl = torch.floor(canonical_level +
                      torch.log2(torch.sqrt(area) / canonical_box_size + 1e-8))
    min_l = int(math.log2(strides[0]))
    max_l = int(math.log2(strides[-1]))
    lvl = lvl.clamp(min_l, max_l).long() - min_l
    out = torch.zeros(boxes.shape[0], output_size, output_size,
                      feats_hwc[0].shape[-1])
    for li, (f, st) in enumerate(zip(feats_hwc, strides)):
        sel = (lvl == li).nonzero(as_tuple=True)[0]
        if len(sel):
            out[sel] = torch_roi_align_level(f, boxes[sel], st, output_size,
                                             sampling_ratio)
    return out


# ---------------------------------------------------------------------------
# mask pasting (detectron2 _do_paste_mask, grid_sample align_corners=False)
# ---------------------------------------------------------------------------

def torch_paste_masks(mask_probs, boxes, height, width, threshold=0.5):
    """mask_probs [N, M, M], boxes [N, 4] -> bool [N, H, W] via separable
    bilinear hat weights with zero padding (ref: custom_rcnn.py:880)."""
    n, m, _ = mask_probs.shape
    xs = torch.arange(width, dtype=torch.float32) + 0.5
    ys = torch.arange(height, dtype=torch.float32) + 0.5
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = (x1 - x0).clamp(min=1e-4)[:, None]
    bh = (y1 - y0).clamp(min=1e-4)[:, None]
    gx = (xs[None, :] - x0[:, None]) / bw * 2.0 - 1.0
    gy = (ys[None, :] - y0[:, None]) / bh * 2.0 - 1.0
    sx = ((gx + 1.0) * m - 1.0) / 2.0
    sy = ((gy + 1.0) * m - 1.0) / 2.0
    taps = torch.arange(m, dtype=torch.float32)
    rx = (1.0 - (sx[..., None] - taps).abs()).clamp(min=0.0)     # [N, W, M]
    ry = (1.0 - (sy[..., None] - taps).abs()).clamp(min=0.0)     # [N, H, M]
    out = torch.einsum("nha,nab,nwb->nhw", ry, mask_probs, rx)
    return out >= threshold


# ---------------------------------------------------------------------------
# fast_rcnn_inference (class-agnostic boxes, per-class NMS, global top-k)
# ---------------------------------------------------------------------------

def torch_multiclass_nms(boxes, scores, score_thresh, nms_thresh, topk):
    """boxes [R, 4] (class-agnostic), scores [R, C+1] -> (boxes, scores,
    classes, rows) of the kept detections (ref: detectron2
    fast_rcnn_inference via detic_roi_heads.py:214-221)."""
    r, c1 = scores.shape
    c = c1 - 1
    fg = scores[:, :c]
    rows, cls = (fg > score_thresh).nonzero(as_tuple=True)
    if len(rows) == 0:
        z = torch.zeros(0)
        return z.reshape(0, 4), z, z.long(), z.long()
    cand_boxes = boxes[rows]
    cand_scores = fg[rows, cls]
    # batched (class-aware) NMS via the coordinate-offset trick
    offset = cls.float()[:, None] * 10000.0
    keep = torch_greedy_nms(cand_boxes + offset, cand_scores, nms_thresh)
    kb, ks = cand_boxes[keep], cand_scores[keep]
    kc, kr = cls[keep], rows[keep]
    if len(ks) > topk:
        top = torch.argsort(ks, descending=True)[:topk]
        kb, ks, kc, kr = kb[top], ks[top], kc[top], kr[top]
    return kb, ks, kc, kr


# ---------------------------------------------------------------------------
# the full-frame oracle model
# ---------------------------------------------------------------------------

class TorchFrameOracle(tnn.Module):
    """Reference-semantics frame in torch, parameter-compatible (through the
    converter) with models.detector.EmbodiedDetector."""

    def __init__(self, cfg, seed=0):
        super().__init__()
        self.cfg = cfg
        fpn_c = cfg.backbone.fpn_channels
        mem_d = cfg.memory.memory_dim

        # backbone (timm resnet50_in21k layout, FrozenBN as eval-mode BN)
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        planes = (64, 128, 256, 512)
        self.layers = tnn.ModuleList()
        for stage, (depth, p) in enumerate(zip(cfg.backbone.depths, planes)):
            cin = 64 if stage == 0 else planes[stage - 1] * 4
            blocks = tnn.ModuleList()
            for i in range(depth):
                stride = (1 if stage == 0 else 2) if i == 0 else 1
                blocks.append(_TorchBottleneck(cin if i == 0 else p * 4, p,
                                               stride, downsample=(i == 0)))
            self.layers.append(blocks)

        # FPN + merge projections
        cins = cfg.backbone.in_channels
        self.lateral1 = tnn.Conv2d(cins[0], fpn_c, 1)
        self.lateral2 = tnn.Conv2d(cins[1], fpn_c, 1)
        self.lateral3 = tnn.Conv2d(cins[2], fpn_c, 1)
        self.output1 = tnn.Conv2d(fpn_c, fpn_c, 3, 1, 1)
        self.output2 = tnn.Conv2d(fpn_c, fpn_c, 3, 1, 1)
        self.output3 = tnn.Conv2d(fpn_c, fpn_c, 3, 1, 1)
        self.p6 = tnn.Conv2d(fpn_c, fpn_c, 3, 2, 1)
        self.p7 = tnn.Conv2d(fpn_c, fpn_c, 3, 2, 1)
        self.map_merge = tnn.ModuleList(
            [tnn.Conv2d(mem_d, fpn_c, 1) for _ in range(3)])

        # CenterNet tower
        nb = cfg.centernet.num_box_convs
        self.tower_convs = tnn.ModuleList(
            [tnn.Conv2d(fpn_c, fpn_c, 3, 1, 1) for _ in range(nb)])
        self.tower_gns = tnn.ModuleList(
            [tnn.GroupNorm(32, fpn_c) for _ in range(nb)])
        self.agn_hm = tnn.Conv2d(fpn_c, 1, 3, 1, 1)
        self.bbox_pred = tnn.Conv2d(fpn_c, 4, 3, 1, 1)
        self.scales = tnn.ParameterList(
            [tnn.Parameter(torch.ones(1))
             for _ in range(len(cfg.centernet.strides))])

        # cascade
        res = cfg.roi.pooler_resolution
        fc = cfg.roi.fc_dim
        zs = cfg.roi.zs_weight_dim
        ns = len(cfg.roi.cascade_ious)
        self.box_fc1 = tnn.ModuleList(
            [tnn.Linear(fpn_c * res * res, fc) for _ in range(ns)])
        self.box_fc2 = tnn.ModuleList([tnn.Linear(fc, fc) for _ in range(ns)])
        self.cls_linear = tnn.ModuleList([tnn.Linear(fc, zs) for _ in range(ns)])
        self.bbox_fc1 = tnn.ModuleList([tnn.Linear(fc, fc) for _ in range(ns)])
        self.bbox_fc2 = tnn.ModuleList([tnn.Linear(fc, 4) for _ in range(ns)])

        # mask head
        mc = cfg.roi.mask_channels
        self.mask_fcn = tnn.ModuleList(
            [tnn.Conv2d(fpn_c if i == 0 else mc, mc, 3, 1, 1)
             for i in range(cfg.roi.mask_num_convs)])
        self.mask_deconv = tnn.ConvTranspose2d(mc, mc, 2, 2)
        self.mask_pred = tnn.Conv2d(mc, 1, 1)

        self.eval()
        self._randomize(seed)

    def _randomize(self, seed):
        rng = np.random.RandomState(seed)
        with torch.no_grad():
            for m in self.modules():
                if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
                    fan = float(np.prod(m.weight.shape[1:]))
                    m.weight.copy_(torch.tensor(
                        rng.randn(*m.weight.shape).astype(np.float32)
                        / math.sqrt(fan)))
                    if m.bias is not None:
                        m.bias.copy_(torch.tensor(
                            rng.randn(*m.bias.shape).astype(np.float32) * 0.05))
                elif isinstance(m, tnn.BatchNorm2d):
                    m.weight.copy_(torch.tensor(
                        (rng.rand(m.num_features) + 0.5).astype(np.float32)))
                    m.bias.copy_(torch.tensor(
                        (rng.randn(m.num_features) * 0.1).astype(np.float32)))
                    m.running_mean.copy_(torch.tensor(
                        (rng.randn(m.num_features) * 0.1).astype(np.float32)))
                    m.running_var.copy_(torch.tensor(
                        (rng.rand(m.num_features) + 0.5).astype(np.float32)))
                elif isinstance(m, tnn.GroupNorm):
                    m.weight.copy_(torch.tensor(
                        (rng.rand(m.num_channels) + 0.5).astype(np.float32)))
                    m.bias.copy_(torch.tensor(
                        (rng.randn(m.num_channels) * 0.1).astype(np.float32)))
            # proposal head biases: heatmap near the focal prior, box preds
            # near the reference's 8-px init so boxes are sane
            self.agn_hm.bias.fill_(-math.log(99.0) / 2)
            self.bbox_pred.bias.fill_(8.0)
            # mask probs must sit AWAY from the 0.5 paste threshold: with
            # random weights they hover at sigmoid(~0)=0.5 and 1e-6 numeric
            # differences flip pixels, which shifts the exact-subsample rank
            # parity of EVERY later pixel (custom_rcnn.py:913 proj[::8] over
            # the compacted observed list) — a trained head is decisive here
            self.mask_pred.bias.fill_(2.5)
            for s in self.scales:
                s.copy_(torch.tensor(
                    (rng.rand(1) * 0.4 + 0.8).astype(np.float32)))

    # -------------------------------------------------- reference state_dict
    def to_reference_state_dict(self):
        """Emit the detectron2-style names convert/torch_weights.py maps."""
        sd = {}

        def put(name, t):
            sd[name] = t.detach().numpy().copy()

        put("backbone.bottom_up.base.conv1.weight", self.conv1.weight)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            put(f"backbone.bottom_up.base.bn1.{leaf}",
                getattr(self.bn1, leaf))
        for stage, blocks in enumerate(self.layers):
            for i, b in enumerate(blocks):
                base = f"backbone.bottom_up.base.layer{stage + 1}.{i}"
                for j in (1, 2, 3):
                    put(f"{base}.conv{j}.weight", getattr(b, f"conv{j}").weight)
                    bn = getattr(b, f"bn{j}")
                    for leaf in ("weight", "bias", "running_mean",
                                 "running_var"):
                        put(f"{base}.bn{j}.{leaf}", getattr(bn, leaf))
                if b.down is not None:
                    put(f"{base}.downsample.0.weight", b.down[0].weight)
                    for leaf in ("weight", "bias", "running_mean",
                                 "running_var"):
                        put(f"{base}.downsample.1.{leaf}",
                            getattr(b.down[1], leaf))
        for lvl, torch_lvl in ((1, 3), (2, 4), (3, 5)):
            lat = getattr(self, f"lateral{lvl}")
            out = getattr(self, f"output{lvl}")
            put(f"backbone.fpn_lateral{torch_lvl}.weight", lat.weight)
            put(f"backbone.fpn_lateral{torch_lvl}.bias", lat.bias)
            put(f"backbone.fpn_output{torch_lvl}.weight", out.weight)
            put(f"backbone.fpn_output{torch_lvl}.bias", out.bias)
        put("backbone.top_block.p6.weight", self.p6.weight)
        put("backbone.top_block.p6.bias", self.p6.bias)
        put("backbone.top_block.p7.weight", self.p7.weight)
        put("backbone.top_block.p7.bias", self.p7.bias)
        for i, m in enumerate(self.map_merge):
            put(f"backbone.map_merge_projection{i + 1}.weight", m.weight)
            put(f"backbone.map_merge_projection{i + 1}.bias", m.bias)
        for i, (cv, gn) in enumerate(zip(self.tower_convs, self.tower_gns)):
            put(f"proposal_generator.centernet_head.bbox_tower.{3 * i}.weight",
                cv.weight)
            put(f"proposal_generator.centernet_head.bbox_tower.{3 * i}.bias",
                cv.bias)
            put(f"proposal_generator.centernet_head.bbox_tower.{3 * i + 1}.weight",
                gn.weight)
            put(f"proposal_generator.centernet_head.bbox_tower.{3 * i + 1}.bias",
                gn.bias)
        put("proposal_generator.centernet_head.agn_hm.weight", self.agn_hm.weight)
        put("proposal_generator.centernet_head.agn_hm.bias", self.agn_hm.bias)
        put("proposal_generator.centernet_head.bbox_pred.weight",
            self.bbox_pred.weight)
        put("proposal_generator.centernet_head.bbox_pred.bias",
            self.bbox_pred.bias)
        for i, s in enumerate(self.scales):
            put(f"proposal_generator.centernet_head.scales.{i}.scale", s)
        for k in range(len(self.box_fc1)):
            put(f"roi_heads.box_head.{k}.fc1.weight", self.box_fc1[k].weight)
            put(f"roi_heads.box_head.{k}.fc1.bias", self.box_fc1[k].bias)
            put(f"roi_heads.box_head.{k}.fc2.weight", self.box_fc2[k].weight)
            put(f"roi_heads.box_head.{k}.fc2.bias", self.box_fc2[k].bias)
            put(f"roi_heads.box_predictor.{k}.cls_score.linear.weight",
                self.cls_linear[k].weight)
            put(f"roi_heads.box_predictor.{k}.cls_score.linear.bias",
                self.cls_linear[k].bias)
            put(f"roi_heads.box_predictor.{k}.bbox_pred.0.weight",
                self.bbox_fc1[k].weight)
            put(f"roi_heads.box_predictor.{k}.bbox_pred.0.bias",
                self.bbox_fc1[k].bias)
            put(f"roi_heads.box_predictor.{k}.bbox_pred.2.weight",
                self.bbox_fc2[k].weight)
            put(f"roi_heads.box_predictor.{k}.bbox_pred.2.bias",
                self.bbox_fc2[k].bias)
        for i, m in enumerate(self.mask_fcn):
            put(f"roi_heads.mask_head.mask_fcn{i + 1}.weight", m.weight)
            put(f"roi_heads.mask_head.mask_fcn{i + 1}.bias", m.bias)
        put("roi_heads.mask_head.deconv.weight", self.mask_deconv.weight)
        put("roi_heads.mask_head.deconv.bias", self.mask_deconv.bias)
        put("roi_heads.mask_head.predictor.weight", self.mask_pred.weight)
        put("roi_heads.mask_head.predictor.bias", self.mask_pred.bias)
        return sd

    # ----------------------------------------------------------- components
    def _backbone(self, x_nchw):
        x = tF.relu(self.bn1(self.conv1(x_nchw)))
        x = tF.max_pool2d(x, 3, 2, 1)
        outs = []
        for blocks in self.layers:
            for b in blocks:
                x = b(x)
            outs.append(x)
        return outs[1], outs[2], outs[3]                        # C3, C4, C5

    def _memory_read(self, mem_features, mem_obs, proj):
        """normalize (obs>1), bf16-rounded gather, 4x4 mean
        (ref: create_implicit_memory custom_rcnn.py:762-823 + timm.py:147-152;
        the bf16 rounding mirrors the fp16 storage/gather of the reference
        and the JAX op's bf16 gather)."""
        denom = torch.where(mem_obs > 1.0, mem_obs,
                            torch.ones_like(mem_obs))
        mem = (mem_features / denom[:, None]).to(torch.bfloat16).float()
        h, w = proj.shape
        ego = mem[proj.reshape(-1).long()].reshape(h, w, -1)
        ego = ego.reshape(h // 4, 4, w // 4, 4, -1).mean(dim=(1, 3))
        return ego                                              # [H/4, W/4, D]

    def _fpn(self, c3, c4, c5, ego):
        lat5 = self.lateral3(c5)
        lat4 = self.lateral2(c4)
        lat3 = self.lateral1(c3)
        m5 = lat5
        m4 = lat4 + tF.interpolate(m5, scale_factor=2, mode="nearest")
        m3 = lat3 + tF.interpolate(m4, scale_factor=2, mode="nearest")
        p5 = self.output3(m5)
        p4 = self.output2(m4)
        p3 = self.output1(m3)
        if ego is not None:
            cur = ego
            fused = []
            for i, p in enumerate((p3, p4, p5)):
                hh, ww, d = cur.shape
                cur = cur.reshape(hh // 2, 2, ww // 2, 2, d).mean(dim=(1, 3))
                proj = self.map_merge[i](
                    cur.permute(2, 0, 1)[None]) * self.cfg.memory.map_feature_weight
                if self.cfg.memory.feat_fusion == "sum":
                    fused.append(p + proj)
                elif self.cfg.memory.feat_fusion == "mem_only":
                    fused.append(proj)
                else:
                    fused.append(p)
            p3, p4, p5 = fused
        p6 = self.p6(p5)
        p7 = self.p7(tF.relu(p6))
        return p3, p4, p5, p6, p7

    def _centernet(self, feats):
        agn_hms, regs = [], []
        for lvl, f in enumerate(feats):
            x = f
            for cv, gn in zip(self.tower_convs, self.tower_gns):
                x = tF.relu(gn(cv(x)))
            agn_hms.append(self.agn_hm(x)[0, 0])                # [H, W]
            reg = self.bbox_pred(x) * self.scales[lvl]
            regs.append(tF.relu(reg)[0].permute(1, 2, 0))       # [H, W, 4]
        return agn_hms, regs

    def _decode(self, agn_hms, regs, training=False):
        """ref: predict_single_level + nms_and_topK (centernet.py:651-745)."""
        ccfg = self.cfg.centernet
        pre = ccfg.pre_nms_topk_train if training else ccfg.pre_nms_topk_test
        post = (ccfg.post_nms_topk_train if training
                else ccfg.post_nms_topk_test)
        nms_t = (ccfg.nms_thresh_train if training else ccfg.nms_thresh_test)
        all_boxes, all_scores = [], []
        for hm, reg, stride in zip(agn_hms, regs, ccfg.strides):
            h, w = hm.shape
            heat = torch.sigmoid(hm.reshape(-1))
            r = reg.reshape(-1, 4) * stride
            k = min(pre, heat.numel())
            top_scores, locs = heat.topk(k)
            keep = top_scores > ccfg.score_thresh
            top_scores, locs = top_scores[keep], locs[keep]
            gx = (locs % w).float() * stride + stride // 2
            gy = torch.div(locs, w, rounding_mode="floor").float() * stride \
                + stride // 2
            rs = r[locs]
            x1 = gx - rs[:, 0]
            y1 = gy - rs[:, 1]
            x2 = torch.maximum(gx + rs[:, 2], x1 + 0.01)
            y2 = torch.maximum(gy + rs[:, 3], y1 + 0.01)
            all_boxes.append(torch.stack([x1, y1, x2, y2], dim=1))
            all_scores.append(torch.sqrt(top_scores))
        boxes = torch.cat(all_boxes)
        scores = torch.cat(all_scores)
        keep = torch_greedy_nms(boxes, scores, nms_t)
        boxes, scores = boxes[keep], scores[keep]
        if len(scores) > post:
            top = torch.argsort(scores, descending=True)[:post]
            boxes, scores = boxes[top], scores[top]
        return boxes, scores

    # ----------------------------------------------------------- training
    @torch.no_grad()
    def train_losses(self, image_hw3, zs_weight, mem_features, mem_obs,
                     proj_indices, gt_boxes, gt_classes):
        """frame_train re-derivation: CenterNet targets/losses (local
        world-size-1 normalization) + training proposal decode + GT
        injection + per-stage cascade matching/losses.
        ref: CustomRCNNRecurrent.forward_model (custom_rcnn.py:584-679),
        CenterNet losses branch (centernet.py:183-318), CascadeROIHeads
        matching (detic_roi_heads.py) — sampler inactive (proposal count
        below batch_size_per_image, divergence #5 identity case)."""
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        self.zs_weight = torch.tensor(np.asarray(zs_weight, np.float32))
        image = torch.tensor(np.asarray(image_hw3, np.float32))
        memf = torch.tensor(np.asarray(mem_features, np.float32))
        memo = torch.tensor(np.asarray(mem_obs, np.float32))
        proj = torch.tensor(np.asarray(proj_indices))
        gtb = torch.tensor(np.asarray(gt_boxes, np.float32))
        gtc = torch.tensor(np.asarray(gt_classes)).long()

        mean = torch.tensor(cfg.input.pixel_mean)
        std = torch.tensor(cfg.input.pixel_std)
        x = ((image - mean) / std).permute(2, 0, 1)[None]
        c3, c4, c5 = self._backbone(x)
        use_memory = cfg.memory.reads_memory()
        ego = self._memory_read(memf, memo, proj) if use_memory else None
        p3, p4, p5, p6, p7 = self._fpn(c3, c4, c5, ego)
        agn_hms, regs = self._centernet((p3, p4, p5, p6, p7))

        shapes = [tuple(hm.shape) for hm in agn_hms]
        hm_t, reg_t, pos_inds = torch_centernet_targets(
            gtb, shapes, cfg.centernet.strides,
            cfg.centernet.sizes_of_interest, cfg.centernet.hm_min_overlap,
            cfg.centernet.min_radius)
        agn_flat = torch.cat([hm.reshape(-1) for hm in agn_hms])
        reg_flat = torch.cat([r.reshape(-1, 4) for r in regs])
        losses = torch_centernet_losses(agn_flat, reg_flat, hm_t, reg_t,
                                        pos_inds, cfg)

        prop_boxes, _ = self._decode(agn_hms, regs, training=True)
        boxes = torch.cat([prop_boxes, gtb], dim=0)
        feats_hwc = [p[0].permute(1, 2, 0) for p in (p3, p4, p5)]
        cur = boxes
        for k in range(len(self.box_fc1)):
            if k > 0:
                cur = torch.stack([cur[:, 0].clamp(0, w),
                                   cur[:, 1].clamp(0, h),
                                   cur[:, 2].clamp(0, w),
                                   cur[:, 3].clamp(0, h)], dim=1)
                nonempty = (cur[:, 2] > cur[:, 0]) & (cur[:, 3] > cur[:, 1])
                cur = cur[nonempty]
            # match at this stage's IoU threshold (single-threshold Matcher)
            iou = _torch_pairwise_iou(cur, gtb)
            best_iou, best = iou.max(dim=1)
            fg = best_iou >= cfg.roi.cascade_ious[k]
            stage_gt_cls = torch.where(fg, gtc[best],
                                       torch.tensor(cfg.roi.num_classes))
            stage_gt_box = torch.where(fg[:, None], gtb[best], cur)

            pooled = torch_multilevel_roi_align(
                feats_hwc, cur, cfg.roi.strides, cfg.roi.pooler_resolution,
                cfg.roi.sampling_ratio, cfg.roi.canonical_box_size,
                cfg.roi.canonical_level)
            xx = pooled.permute(0, 3, 1, 2).flatten(1)
            xx = tF.relu(self.box_fc1[k](xx))
            xx = tF.relu(self.box_fc2[k](xx))
            feat = self.cls_linear[k](xx)
            feat_n = cfg.roi.norm_temperature * tF.normalize(feat, p=2, dim=1)
            logits = feat_n @ self.zs_weight
            d = tF.relu(self.bbox_fc1[k](xx))
            deltas = self.bbox_fc2[k](d)
            sl = torch_stage_losses(logits, deltas, cur, stage_gt_box,
                                    stage_gt_cls,
                                    cfg.roi.cascade_bbox_reg_weights[k],
                                    cfg.roi.num_classes)
            losses.update({f"{n}_stage{k}": v for n, v in sl.items()})
            cur = torch_apply_deltas(deltas, cur,
                                     cfg.roi.cascade_bbox_reg_weights[k])
        return {k: float(v) for k, v in losses.items()}

    def _cascade(self, feats_hwc, boxes):
        """3 stages; stage-0 boxes unclipped, later stages clipped.
        Returns (final_boxes, mean_scores, stage0_logits, stage0_clip_feats)
        — the memory write runs on the ORIGINAL stage-0 proposals: the
        reference roi_heads.forward returns the input Instances unchanged
        (_forward_box rebinds `proposals` to fresh Instances for k>0,
        detic_roi_heads.py:108-115; only _run_stage at k=0 sets .feat on
        the originals, :341-346), so inference_with_proposals reads
        unregressed CenterNet boxes + stage-0 CLIP embeddings
        (custom_rcnn.py:827-829)."""
        rcfg = self.cfg.roi
        h, w = self.cfg.input.height, self.cfg.input.width
        cur = boxes
        sigmoids, feats0, logits0 = [], None, None
        for k in range(len(self.box_fc1)):
            pooled = torch_multilevel_roi_align(
                feats_hwc, cur, rcfg.strides, rcfg.pooler_resolution,
                rcfg.sampling_ratio, rcfg.canonical_box_size,
                rcfg.canonical_level)
            # NHWC flatten matches the flax BoxHead; the converter maps the
            # torch NCHW fc1 weight with _fc_after_pool, so the torch side
            # must flatten NCHW
            x = pooled.permute(0, 3, 1, 2).flatten(1)
            x = tF.relu(self.box_fc1[k](x))
            x = tF.relu(self.box_fc2[k](x))
            feat = self.cls_linear[k](x)
            feat_n = rcfg.norm_temperature * tF.normalize(feat, p=2, dim=1)
            logits = feat_n @ self.zs_weight
            d = tF.relu(self.bbox_fc1[k](x))
            deltas = self.bbox_fc2[k](d)
            sigmoids.append(torch.sigmoid(logits))
            if k == 0:
                feats0, logits0 = feat_n, logits
            cur = torch_apply_deltas(deltas, cur,
                                     rcfg.cascade_bbox_reg_weights[k])
            cur = torch.stack([cur[:, 0].clamp(0, w), cur[:, 1].clamp(0, h),
                               cur[:, 2].clamp(0, w), cur[:, 3].clamp(0, h)],
                              dim=1)
        mean_scores = torch.stack(sigmoids).mean(dim=0)
        return cur, mean_scores, logits0, feats0

    def _mask_probs(self, feats_hwc, boxes):
        rcfg = self.cfg.roi
        pooled = torch_multilevel_roi_align(
            feats_hwc, boxes, rcfg.strides, rcfg.mask_pooler_resolution,
            rcfg.sampling_ratio, rcfg.canonical_box_size, rcfg.canonical_level)
        x = pooled.permute(0, 3, 1, 2)
        for m in self.mask_fcn:
            x = tF.relu(m(x))
        x = tF.relu(self.mask_deconv(x))
        return torch.sigmoid(self.mask_pred(x))[:, 0]           # [R, 28, 28]

    # -------------------------------------------------------------- the frame
    @torch.no_grad()
    def frame(self, image_hw3, zs_weight, mem_features, mem_obs, proj_indices):
        """One frame: inference + memory write. All inputs numpy; returns a
        dict of numpy outputs mirroring FrameOutputs + the memory update."""
        cfg = self.cfg
        h, w = cfg.input.height, cfg.input.width
        self.zs_weight = torch.tensor(np.asarray(zs_weight, np.float32))
        image = torch.tensor(np.asarray(image_hw3, np.float32))
        memf = torch.tensor(np.asarray(mem_features, np.float32))
        memo = torch.tensor(np.asarray(mem_obs, np.float32))
        proj = torch.tensor(np.asarray(proj_indices))

        mean = torch.tensor(cfg.input.pixel_mean)
        std = torch.tensor(cfg.input.pixel_std)
        x = ((image - mean) / std).permute(2, 0, 1)[None]

        c3, c4, c5 = self._backbone(x)
        use_memory = cfg.memory.reads_memory()
        ego = self._memory_read(memf, memo, proj) if use_memory else None
        p3, p4, p5, p6, p7 = self._fpn(c3, c4, c5, ego)
        agn_hms, regs = self._centernet((p3, p4, p5, p6, p7))
        prop_boxes, prop_scores = self._decode(agn_hms, regs)

        feats_hwc = [p[0].permute(1, 2, 0) for p in (p3, p4, p5)]
        final_boxes, mean_scores, logits0, clip_feats = \
            self._cascade(feats_hwc, prop_boxes)
        scores = mean_scores
        if cfg.roi.mult_proposal_score:
            scores = torch.sqrt(scores * prop_scores.clamp(min=0)[:, None])
        db, ds, dc, _ = torch_multiclass_nms(
            final_boxes, scores, cfg.roi.score_thresh_test,
            cfg.roi.nms_thresh_test, cfg.roi.detections_per_image)

        # ---- memory write (ref: update_implicit_memory /
        # inference_with_proposals, custom_rcnn.py:681-882) — runs on the
        # ORIGINAL stage-0 proposal boxes + stage-0 CLIP features, with an
        # unconditional proposal-score multiply (custom_rcnn.py:853-855)
        wscores = torch.sqrt(torch.sigmoid(logits0) *
                             prop_scores.clamp(min=0)[:, None])
        _, _, _, wrows = torch_multiclass_nms(
            prop_boxes, wscores, cfg.memory.cls_score_thresh,
            cfg.memory.write_nms_thresh, cfg.memory.write_topk)
        rows = torch.unique(wrows).sort().values[: cfg.memory.write_topk]
        if len(rows):
            wboxes = prop_boxes[rows]
            wfeats = clip_feats[rows]
            probs = self._mask_probs(feats_hwc, wboxes)
            masks = torch_paste_masks(probs, wboxes, h, w,
                                      cfg.memory.mask_thresh)
            upd, obs_upd = torch_memory_write_oracle(
                wfeats.numpy(), masks.numpy(), proj.numpy(),
                cfg.memory.max_cells, subsample=cfg.memory.pixel_subsample)
        else:
            upd = np.zeros((cfg.memory.max_cells, memf.shape[1]), np.float32)
            obs_upd = np.zeros((cfg.memory.max_cells,), np.float32)
            wboxes = torch.zeros(0, 4)

        return dict(
            proposal_boxes=prop_boxes.numpy(),
            proposal_scores=prop_scores.numpy(),
            boxes=db.numpy(), scores=ds.numpy(), classes=dc.numpy(),
            write_rows=rows.numpy(), write_boxes=wboxes.numpy(),
            features_update=np.asarray(upd, np.float32),
            obs_update=np.asarray(obs_upd, np.float32),
            new_features=memf.numpy() + upd,
            new_obs=memo.numpy() + obs_upd,
        )


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.down(x) if self.down is not None else x
        return tF.relu(out + sc)


# ---------------------------------------------------------------------------
# training-side oracle: CenterNet GT assignment + losses + cascade losses
# (ref: centernet.py:342-570, heatmap_focal_loss.py:51-85, iou_loss.py,
#  detic_fast_rcnn.py:201-300; world-size-1 local normalization)
# ---------------------------------------------------------------------------

def torch_centernet_targets(boxes, shapes, strides, sizes_of_interest,
                            hm_min_overlap=0.8, min_radius=4):
    """boxes [N, 4] (valid only) -> (agn_heatmap [M], reg_targets [M, 4]
    stride-normalized, pos_inds [unique peak indices]) for one image.
    ref: _get_ground_truth / _get_label_inds (centernet.py:342-491)."""
    INF = 1e8
    grids = []
    num_loc = []
    for (h, w), s in zip(shapes, strides):
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        gx = xs.float() * s + s // 2
        gy = ys.float() * s + s // 2
        grids.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], dim=1))
        num_loc.append(h * w)
    grid = torch.cat(grids)                                   # [M, 2]
    m = grid.shape[0]
    stride_m = torch.cat([torch.full((n,), float(s))
                          for n, s in zip(num_loc, strides)])
    ranges_m = torch.cat([torch.tensor(r, dtype=torch.float32)
                          .view(1, 2).expand(n, 2)
                          for n, r in zip(num_loc, sizes_of_interest)])

    n = boxes.shape[0]
    if n == 0:
        return torch.zeros(m), torch.full((m, 4), -INF), torch.zeros(0).long()
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
           (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    l = grid[:, 0:1] - boxes[:, 0].view(1, n)
    t = grid[:, 1:2] - boxes[:, 1].view(1, n)
    r = boxes[:, 2].view(1, n) - grid[:, 0:1]
    b = boxes[:, 3].view(1, n) - grid[:, 1:2]
    reg = torch.stack([l, t, r, b], dim=2)                    # [M, N, 4]

    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    se = stride_m.view(m, 1, 1).expand(m, n, 2)
    cd = ((centers.view(1, n, 2).expand(m, n, 2) / se).int() * se).float() \
        + se / 2
    is_peak = ((grid.view(m, 1, 2) - cd) ** 2).sum(2) == 0
    in_boxes = reg.min(dim=2)[0] > 0
    dx = (grid.view(m, 1, 2)[:, :, 0] - cd[:, :, 0]).abs()
    dy = (grid.view(m, 1, 2)[:, :, 1] - cd[:, :, 1]).abs()
    center3 = (dx <= se[:, :, 0]) & (dy <= se[:, :, 0]) & in_boxes
    crit = ((reg[:, :, :2] + reg[:, :, 2:]) ** 2).sum(2).sqrt() / 2
    cared = (crit >= ranges_m[:, [0]]) & (crit <= ranges_m[:, [1]])
    reg_mask = center3 & cared

    dist2 = ((grid.view(m, 1, 2) - centers.view(1, n, 2)) ** 2).sum(2)
    dist2[is_peak] = 0
    radius2 = ((1 - hm_min_overlap) / (1 + hm_min_overlap)) ** 2 * 2 * area
    radius2 = radius2.clamp(min=min_radius ** 2)
    wdist2 = dist2 / radius2.view(1, n)

    wd = wdist2.clone()
    wd[reg_mask == 0] = INF
    min_dist, min_idx = wd.min(dim=1)
    reg_t = reg[torch.arange(m), min_idx]
    reg_t[min_dist == INF] = -INF
    reg_t = torch.where(reg_t <= -INF / 2, reg_t,
                        reg_t / stride_m[:, None])

    hm = torch.exp(-wdist2.min(dim=1)[0])
    hm[hm < 1e-4] = 0

    # peak positives (_get_label_inds, B=1)
    level_bases = np.cumsum([0] + num_loc[:-1])
    pos = []
    diag = ((boxes[:, 2:] - boxes[:, :2]) ** 2).sum(1).sqrt() / 2
    for li, ((h, w), s, rg) in enumerate(zip(shapes, strides,
                                             sizes_of_interest)):
        ci = (centers / s).long()
        inside = (ci[:, 0] >= 0) & (ci[:, 0] < w) & \
                 (ci[:, 1] >= 0) & (ci[:, 1] < h)
        cared_l = (diag >= rg[0]) & (diag <= rg[1]) & inside
        flat = level_bases[li] + ci[:, 1].clamp(0, h - 1) * w + \
            ci[:, 0].clamp(0, w - 1)
        pos.append(flat[cared_l])
    # NO unique(): the reference concatenates one index per cared
    # (gt,level) pair, so a shared center cell counts with multiplicity
    # in both the focal pos sum and num_pos (centernet.py:483-491)
    pos_inds = torch.cat(pos) if pos else torch.zeros(0).long()
    return hm, reg_t, pos_inds


def torch_centernet_losses(agn_flat, reg_flat, hm, reg_t, pos_inds, cfg):
    """binary focal + gIoU-ltrb, LOCAL normalization (world size 1;
    ref: centernet.py:241-318 + heatmap_focal_loss.py:51-85)."""
    c = cfg.centernet
    pred = torch.sigmoid(agn_flat).clamp(c.sigmoid_clamp,
                                         1 - c.sigmoid_clamp)
    neg_w = (1 - hm) ** c.hm_focal_beta
    pos_pred = pred[pos_inds]
    pos_loss = (torch.log(pos_pred) * (1 - pos_pred) ** c.loss_gamma).sum()
    neg_loss = torch.log(1 - pred) * pred ** c.loss_gamma * neg_w
    if c.ignore_high_fp > 0:
        neg_loss = neg_loss * (pred < c.ignore_high_fp).float()
    neg_loss = neg_loss.sum()
    pos_loss, neg_loss = -pos_loss, -neg_loss
    if c.hm_focal_alpha >= 0:
        pos_loss = c.hm_focal_alpha * pos_loss
        neg_loss = (1 - c.hm_focal_alpha) * neg_loss
    num_pos = max(float(len(pos_inds)), 1.0)

    reg_valid = reg_t.max(dim=1)[0] >= 0
    pr = reg_flat[reg_valid]
    tg = reg_t[reg_valid]
    t_area = (tg[:, 0] + tg[:, 2]) * (tg[:, 1] + tg[:, 3])
    p_area = (pr[:, 0] + pr[:, 2]) * (pr[:, 1] + pr[:, 3])
    w_i = torch.minimum(pr[:, 0], tg[:, 0]) + torch.minimum(pr[:, 2], tg[:, 2])
    h_i = torch.minimum(pr[:, 3], tg[:, 3]) + torch.minimum(pr[:, 1], tg[:, 1])
    gw = torch.maximum(pr[:, 0], tg[:, 0]) + torch.maximum(pr[:, 2], tg[:, 2])
    gh = torch.maximum(pr[:, 3], tg[:, 3]) + torch.maximum(pr[:, 1], tg[:, 1])
    inter = w_i * h_i
    union = t_area + p_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (gw * gh - union) / (gw * gh).clamp(min=1e-12)
    reg_norm = max(float(reg_valid.sum()), 1.0)
    return {
        "loss_centernet_agn_pos": c.pos_weight * pos_loss / num_pos,
        "loss_centernet_agn_neg": c.neg_weight * neg_loss / num_pos,
        "loss_centernet_loc": c.reg_weight * (1 - gious).sum() / reg_norm,
    }


def torch_stage_losses(logits, deltas, boxes, gt_boxes, gt_classes,
                       reg_weights, num_classes):
    """sigmoid CE + gIoU box reg, detectron2 normalization
    (detic_fast_rcnn.py:201-233, :269-300)."""
    bsz = logits.shape[0]
    c = num_classes
    target = torch.zeros(bsz, c + 1)
    target[torch.arange(bsz), gt_classes] = 1
    bce = tF.binary_cross_entropy_with_logits(
        logits[:, :-1], target[:, :c], reduction="none")
    loss_cls = bce.sum() / bsz

    fg = gt_classes < c
    pred = torch_apply_deltas(deltas[fg], boxes[fg], reg_weights)
    g = gt_boxes[fg]
    x1 = torch.maximum(pred[:, 0], g[:, 0])
    y1 = torch.maximum(pred[:, 1], g[:, 1])
    x2 = torch.minimum(pred[:, 2], g[:, 2])
    y2 = torch.minimum(pred[:, 3], g[:, 3])
    inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    union = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1]) + \
            (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1]) - inter
    iou = inter / union.clamp(min=1e-7)
    cx1 = torch.minimum(pred[:, 0], g[:, 0])
    cy1 = torch.minimum(pred[:, 1], g[:, 1])
    cx2 = torch.maximum(pred[:, 2], g[:, 2])
    cy2 = torch.maximum(pred[:, 3], g[:, 3])
    ac = (cx2 - cx1) * (cy2 - cy1)
    giou = iou - (ac - union) / ac.clamp(min=1e-7)
    loss_box = (1 - giou).sum() / bsz
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def _torch_pairwise_iou(a, b):
    """XYXY IoU matrix [N, M] (detectron2 pairwise_iou semantics)."""
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    union = area_a + area_b - inter
    return torch.where(union > 0, inter / union, torch.zeros_like(inter))


def torch_get_fed_loss_inds(gt_classes, num_sample_cats, C, weight,
                            generator=None):
    """Faithful re-derivation of get_fed_loss_inds
    (detic/modeling/utils.py:16-29): unique matched classes (incl. the
    background index C) + multinomial-without-replacement extras drawn from
    the class-frequency weights with appeared classes and background zeroed.
    """
    appeared = torch.unique(gt_classes)
    prob = appeared.new_ones(C + 1).float()
    prob[-1] = 0
    if len(appeared) < num_sample_cats:
        if weight is not None:
            prob[:C] = weight.float().clone()
        prob[appeared] = 0
        more = torch.multinomial(prob, num_sample_cats - len(appeared),
                                 replacement=False, generator=generator)
        appeared = torch.cat([appeared, more])
    return appeared


def torch_cls_loss(logits, gt_classes, num_classes, class_mask=None,
                   use_sigmoid_ce=True):
    """The classification branches of DeticFastRCNNOutputLayers.losses:
    sigmoid CE with federated class masking (detic_fast_rcnn.py:201-233) or
    the plain/weighted softmax CE (:236-266). `class_mask` is the [C] 0/1
    foreground mask built from torch_get_fed_loss_inds."""
    bsz = logits.shape[0]
    c = num_classes
    if use_sigmoid_ce:
        target = torch.zeros(bsz, c + 1)
        target[torch.arange(bsz), gt_classes] = 1
        bce = tF.binary_cross_entropy_with_logits(
            logits[:, :-1], target[:, :c], reduction="none")
        if class_mask is not None:
            bce = bce * class_mask.float().view(1, c).expand(bsz, c)
        return bce.sum() / bsz
    if class_mask is not None:
        # ref :258-262 — appeared_mask over C+1 with background forced 1
        w = torch.cat([class_mask.float(), torch.ones(1)])
        return tF.cross_entropy(logits, gt_classes, weight=w,
                                reduction="mean")
    return tF.cross_entropy(logits, gt_classes, reduction="mean")
