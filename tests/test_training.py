"""Training: loss correctness + a sharded train step on the 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodied_object_detection_tpu.config import SolverConfig
from embodied_object_detection_tpu.models.losses import (
    centernet_targets, centernet_losses, binary_heatmap_focal_loss,
    giou_loss_ltrb, match_proposals, stage_losses, add_gt_to_proposals)
from embodied_object_detection_tpu.structures import GroundTruth, Detections
from embodied_object_detection_tpu.engine.solver import (
    build_optimizer, warmup_cosine_schedule, param_labels)

from common import tiny_config


def _gt(boxes, classes, capacity=8):
    g = len(boxes)
    b = np.zeros((capacity, 4), np.float32)
    c = np.zeros((capacity,), np.int32)
    v = np.zeros((capacity,), bool)
    b[:g] = boxes
    c[:g] = classes
    v[:g] = True
    return GroundTruth(jnp.asarray(b), jnp.asarray(c), jnp.asarray(v))


def test_centernet_targets_peak_and_heatmap():
    cfg = tiny_config().centernet
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    # one box of diag/2 ~ 28 -> level 0 (range 0..80) and maybe level 1 (64..160): no
    gt = _gt([[32, 32, 72, 72]], [0])
    tg = centernet_targets(gt, shapes, cfg)
    m = sum(h * w for h, w in shapes)
    assert tg.agn_heatmap.shape == (m,)
    assert tg.reg_targets.shape == (m, 4)
    # the discretized center cell at level 0: center (52,52)//8 = (6,6)
    flat = 6 * 20 + 6
    assert int(tg.pos_count[flat]) == 1
    assert float(tg.agn_heatmap[flat]) == 1.0       # peak -> exp(0)
    # its reg target: grid center (52, 52) -> l=t=20, r=b=20, /stride 8
    np.testing.assert_allclose(np.asarray(tg.reg_targets[flat]),
                               [20 / 8] * 4, atol=1e-5)
    # positives only at one level for this size
    assert int(jnp.sum(tg.pos_count)) == 1


def test_centernet_targets_empty_gt():
    cfg = tiny_config().centernet
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    gt = _gt(np.zeros((0, 4)), np.zeros(0))
    tg = centernet_targets(gt, shapes, cfg)
    assert float(jnp.sum(tg.agn_heatmap)) == 0.0
    assert int(jnp.sum(tg.pos_count)) == 0
    assert bool(jnp.all(tg.reg_targets < -1e7))


def test_focal_loss_perfect_prediction_small():
    cfg = tiny_config().centernet
    m = 100
    target = np.zeros(m, np.float32)
    target[3] = 1.0
    pos = np.zeros(m, bool)
    pos[3] = True
    logits = np.full(m, -20.0, np.float32)
    logits[3] = 20.0
    pos_l, neg_l = binary_heatmap_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(pos), cfg)
    # near-perfect prediction -> tiny losses (sigmoid clamp bounds them)
    assert float(pos_l) < 1e-2
    assert float(neg_l) < 1e-2


def test_giou_ltrb_zero_for_exact():
    pred = jnp.asarray(np.array([[1.0, 2.0, 3.0, 4.0]], np.float32))
    loss = giou_loss_ltrb(pred, pred)
    assert abs(float(loss[0])) < 1e-6


def test_match_proposals():
    gt = _gt([[0, 0, 100, 100]], [7], capacity=4)
    boxes = jnp.asarray(np.array([
        [0, 0, 100, 100],       # IoU 1 -> fg
        [0, 0, 50, 100],        # IoU .5 -> bg at 0.6
        [200, 200, 300, 300],   # IoU 0 -> bg
    ], np.float32))
    m = match_proposals(boxes, jnp.ones(3, bool), gt, 0.6, num_classes=20)
    assert int(m.gt_classes[0]) == 7
    assert int(m.gt_classes[1]) == 20
    assert int(m.gt_classes[2]) == 20


def test_stage_losses_perfect():
    gt = _gt([[10, 10, 50, 50]], [2], capacity=4)
    boxes = jnp.asarray(np.array([[10, 10, 50, 50]], np.float32))
    m = match_proposals(boxes, jnp.ones(1, bool), gt, 0.6, num_classes=5)
    logits = np.full((1, 6), -20.0, np.float32)
    logits[0, 2] = 20.0
    deltas = np.zeros((1, 4), np.float32)
    out = stage_losses(jnp.asarray(logits), jnp.asarray(deltas), m,
                       (10., 10., 5., 5.), num_classes=5)
    assert float(out["loss_cls"]) < 1e-6
    assert float(out["loss_box_reg"]) < 1e-5


def test_add_gt_to_proposals_scores_one():
    props = Detections(boxes=jnp.zeros((4, 4)), scores=jnp.full((4,), 0.5),
                       classes=jnp.zeros((4,), jnp.int32),
                       valid=jnp.ones((4,), bool))
    gt = _gt([[0, 0, 10, 10]], [0], capacity=2)
    out = add_gt_to_proposals(props, gt)
    assert out.boxes.shape == (6, 4)
    assert float(out.scores[4]) == 1.0      # appended GT has score 1
    assert not bool(out.valid[5])           # padded GT row invalid


def test_warmup_cosine_schedule():
    cfg = SolverConfig(base_lr=1e-3, warmup_iters=100, warmup_factor=0.01,
                       max_iter=1000)
    s = warmup_cosine_schedule(cfg)
    assert abs(float(s(0)) - 1e-3 * 0.01) < 1e-12
    assert abs(float(s(100)) - 1e-3 * 0.5 * (1 + np.cos(np.pi * 0.1))) < 1e-9
    assert float(s(999)) < 1e-5


def test_param_labels_and_freezing():
    params = {"params": {
        "backbone": {"layer1_0": {"bn1": {"running_mean": jnp.zeros(3),
                                          "weight": jnp.zeros(3)},
                                  "conv1": {"kernel": jnp.zeros((1, 1, 3, 3))}}},
        "fpn": {"map_merge_projection1": {"kernel": jnp.zeros((1, 1, 4, 4))}},
        "roi_heads": {"box_head0": {"fc1": {"kernel": jnp.zeros((4, 4))}}},
    }}
    labels = param_labels(params, SolverConfig())
    p = labels["params"]
    assert p["backbone"]["layer1_0"]["bn1"]["running_mean"] == "frozen"
    assert p["backbone"]["layer1_0"]["conv1"]["kernel"] == "backbone"
    # fpn lives under the reference's `backbone.*` namespace (timm.py:54)
    # and the lr multipliers stack multiplicatively (custom_solver.py:24-44)
    assert p["fpn"]["map_merge_projection1"]["kernel"] == "backbone_custom"
    assert p["roi_heads"]["box_head0"]["fc1"]["kernel"] == "default"


@pytest.mark.slow
def test_train_step_runs_and_decreases_loss(rng):
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel import (
        make_mesh, shard_batch, replicate)
    from embodied_object_detection_tpu.parallel.train_step import (
        make_train_step, jit_train_step, TrainBatch)

    cfg = tiny_config()
    # small training top-k so the cascade stays cheap on CPU
    cfg = cfg.replace(centernet=dataclasses.replace(
        cfg.centernet, post_nms_topk_train=32, pre_nms_topk_train=128))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)

    mesh = make_mesh()
    assert mesh.devices.size == 8           # virtual CPU mesh

    b = 8
    h, w = cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_boxes[:, 0] = [20, 20, 90, 90]
    gt_valid[:, 0] = True
    batch = TrainBatch(
        image=rng.randint(0, 255, (b, h, w, 3)).astype(np.float32),
        proj_indices=rng.randint(0, cfg.memory.max_cells, (b, h, w)).astype(np.int32),
        mem_features=np.zeros((b, cfg.memory.max_cells, cfg.memory.memory_dim),
                              np.float32),
        mem_obs=np.zeros((b, cfg.memory.max_cells), np.float32),
        gt_boxes=gt_boxes,
        gt_classes=np.zeros((b, g), np.int32),
        gt_valid=gt_valid,
        weight=np.ones((b,), np.float32),
    )
    zs = rng.randn(cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1).astype(np.float32)

    with mesh:
        batch_d = shard_batch(mesh, batch)
        state = replicate(mesh, state)
        zs_d = replicate(mesh, jnp.asarray(zs))
        step = jit_train_step(step_fn, mesh)
        state, losses0 = step(state, batch_d, zs_d)
        l0 = float(losses0["total_loss"])
        for _ in range(3):
            state, losses = step(state, batch_d, zs_d)
        l1 = float(losses["total_loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0          # same batch, loss must drop


def test_image_label_loss_max_size():
    from embodied_object_detection_tpu.models.losses import image_label_loss
    r, c = 5, 4
    logits = np.full((r, c + 1), -10.0, np.float32)
    # proposal 2 is the largest; give it a perfect score for label 1
    logits[2, 1] = 10.0
    boxes = np.array([[0, 0, 10, 10], [0, 0, 20, 20], [0, 0, 100, 100],
                      [0, 0, 5, 5], [0, 0, 640, 480]], np.float32)
    valid = np.ones(r, bool)
    labels = np.array([1], np.int32)
    lvalid = np.ones(1, bool)
    # note: max_size excludes the last (image) box per the reference
    loss_good = float(image_label_loss(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(valid),
        jnp.asarray(labels), jnp.asarray(lvalid), c))
    logits[2, 1] = -10.0
    loss_bad = float(image_label_loss(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(valid),
        jnp.asarray(labels), jnp.asarray(lvalid), c))
    assert loss_good < loss_bad


def test_fed_loss_class_weight():
    from embodied_object_detection_tpu.models.losses import fed_loss_class_weight
    c = 50
    gt = np.array([3, 7, 7, 0], np.int32)
    valid = np.array([True, True, True, False])
    freq = np.ones(c, np.float32)
    w = np.asarray(fed_loss_class_weight(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(freq),
        num_sample_cats=10, num_classes=c, rng=jax.random.PRNGKey(0)))
    assert w[3] == 1 and w[7] == 1       # appeared classes always in
    assert w[0] in (0.0, 1.0)            # class 0 not forced (gt row invalid)
    assert w.sum() == 10                 # exactly num_sample_cats selected


@pytest.mark.slow
def test_frame_train_weak(rng):
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    labels = jnp.asarray([1, 3], dtype=jnp.int32)
    lvalid = jnp.asarray([True, False])
    losses = model.apply(params, img, zs, labels, lvalid,
                         method=EmbodiedDetector.frame_train_weak)
    assert set(losses) == {f"image_loss_stage{i}" for i in range(3)}
    for v in losses.values():
        assert np.isfinite(float(v))
    # gradients flow to the classifier
    def total(p):
        out = model.apply(p, img, zs, labels, lvalid,
                          method=EmbodiedDetector.frame_train_weak)
        return sum(out.values())
    g = jax.grad(total)(params)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
    assert gnorm > 0


def test_caption_loss():
    from embodied_object_detection_tpu.models.losses import caption_loss
    d, b = 16, 4
    rng_ = np.random.RandomState(0)
    caps = rng_.randn(b, d).astype(np.float32)
    # region embedding aligned with caption 2
    region = np.zeros((3, d), np.float32)
    region[-1] = caps[2] * 10
    good = float(caption_loss(jnp.asarray(region), jnp.asarray(caps), 2))
    bad = float(caption_loss(jnp.asarray(region), jnp.asarray(caps), 0))
    assert good < bad


def test_softmax_ce_variant():
    from embodied_object_detection_tpu.models.losses import (
        softmax_cross_entropy_loss)
    logits = np.full((3, 6), -5.0, np.float32)
    logits[0, 2] = 5.0
    logits[1, 5] = 5.0          # background correct
    gt = jnp.asarray([2, 5, 0])
    valid = jnp.asarray([True, True, False])
    loss = float(softmax_cross_entropy_loss(jnp.asarray(logits), gt, valid, 5))
    assert loss < 0.01          # both valid rows near-perfect


def test_sample_proposals_caps_positives_and_fills_batch(rng):
    """detectron2 subsample_labels semantics: <= batch*frac positives,
    batch filled with negatives, invalid rows never selected."""
    from embodied_object_detection_tpu.models.losses import sample_proposals
    n, batch = 600, 128
    valid = jnp.asarray(rng.rand(n) > 0.1)
    fg = jnp.asarray(rng.rand(n) > 0.5) & valid
    idx, keep = sample_proposals(valid, fg, batch, 0.25,
                                 jax.random.PRNGKey(0))
    assert idx.shape == (batch,)
    sel_fg = np.asarray(fg)[np.asarray(idx)] & np.asarray(keep)
    sel_valid = np.asarray(valid)[np.asarray(idx)] & np.asarray(keep)
    assert sel_fg.sum() == 32                      # exactly the positive cap
    assert sel_valid.sum() == batch                # plenty of candidates
    assert sel_valid[~np.asarray(keep)].sum() == 0

    # scarce positives: all of them selected
    fg2 = jnp.zeros((n,), bool).at[:5].set(True) & valid
    idx2, keep2 = sample_proposals(valid, fg2, batch, 0.25,
                                   jax.random.PRNGKey(1))
    sel_fg2 = np.asarray(fg2)[np.asarray(idx2)] & np.asarray(keep2)
    assert sel_fg2.sum() == int(np.asarray(fg2).sum())

    # fewer candidates than the batch: the rest is masked out
    few_valid = jnp.zeros((n,), bool).at[:40].set(True)
    idx3, keep3 = sample_proposals(few_valid, fg & few_valid, batch, 0.25,
                                   jax.random.PRNGKey(2))
    assert int(np.asarray(keep3).sum()) == 40


@pytest.mark.slow
def test_frame_train_with_proposal_sampling(rng):
    """frame_train with batch_size_per_image < #proposals: sampling active,
    losses finite, gradients flow (the default-config 2000-proposal path)."""
    import jax
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import GroundTruth
    cfg = tiny_config()
    cfg = cfg.replace(roi=dataclasses.replace(cfg.roi,
                                              batch_size_per_image=16,
                                              positive_fraction=0.25))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    image = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    memf = jnp.zeros((cfg.memory.max_cells, cfg.memory.memory_dim))
    memo = jnp.zeros((cfg.memory.max_cells,))
    proj = jnp.asarray(rng.randint(0, cfg.memory.max_cells, (h, w)),
                       dtype=jnp.int32)
    gt_b = np.zeros((g, 4), np.float32)
    gt_b[0] = [4, 4, 40, 40]
    gt = GroundTruth(boxes=jnp.asarray(gt_b),
                     classes=jnp.zeros((g,), jnp.int32),
                     valid=jnp.asarray(np.arange(g) < 1))

    def loss(p, key):
        losses = model.apply(p, image, zs, memf, memo, proj, gt, key,
                             method=EmbodiedDetector.frame_train)
        return sum(losses.values())

    val, grads = jax.value_and_grad(loss)(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(x ** 2)) for x in
                jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
    # different sampling keys give different losses (sampling is active)
    v2 = loss(params, jax.random.PRNGKey(4))
    assert float(v2) != pytest.approx(float(val), abs=1e-9)


def test_centernet_global_norm_semantics():
    """Batch-global CenterNet normalization matches the reference's cross-GPU
    reduce_sum semantics (centernet.py:258-265, 291-293): per-frame raw sums
    divided by the mean positive/regression count over the global batch —
    NOT each frame's local count."""
    from embodied_object_detection_tpu.config import CenterNetConfig
    from embodied_object_detection_tpu.models.losses import (
        centernet_raw_losses, centernet_normalize)

    ccfg = CenterNetConfig()
    rng = np.random.RandomState(0)
    shapes = ((8, 10), (4, 5))
    m = sum(h * w for h, w in shapes)

    # two frames with very different positive counts
    frames = []
    for nbox in (1, 4):
        boxes = np.zeros((8, 4), np.float32)
        valid = np.zeros((8,), bool)
        for i in range(nbox):
            x, y = 8 + 20 * i, 8 + 8 * i
            boxes[i] = [x, y, x + 30, y + 28]
        valid[:nbox] = True
        gt = GroundTruth(jnp.asarray(boxes),
                         jnp.zeros((8,), jnp.int32), jnp.asarray(valid))
        tgt = centernet_targets(gt, shapes, ccfg)
        agn = jnp.asarray(rng.randn(m).astype(np.float32))
        reg = jnp.asarray(np.abs(rng.randn(m, 4)).astype(np.float32))
        frames.append(centernet_raw_losses(agn, reg, tgt, ccfg))

    n0, n1 = float(frames[0].num_pos), float(frames[1].num_pos)
    assert n0 != n1 and n0 >= 1       # the scenario the fix exists for

    # what the batch step computes (train_step.py loss_fn)
    num_pos_avg = (n0 + n1) / 2
    reg_norm = (float(frames[0].reg_cnt) + float(frames[1].reg_cnt)) / 2
    got_pos = (float(frames[0].pos) + float(frames[1].pos)) / 2 / max(num_pos_avg, 1)
    got_loc = (float(frames[0].loc) + float(frames[1].loc)) / 2 / max(reg_norm, 1)

    # reference: per frame loss_f = raw_f / num_pos_avg (same global
    # normalizer for every rank), then mean over frames
    want_pos = np.mean([float(f.pos) / max(num_pos_avg, 1) for f in frames])
    want_loc = np.mean([float(f.loc) / max(reg_norm, 1) for f in frames])
    np.testing.assert_allclose(got_pos, want_pos, rtol=1e-6)
    np.testing.assert_allclose(got_loc, want_loc, rtol=1e-6)

    # and it differs from per-frame local normalization (the round-2 bug)
    local = np.mean([float(f.pos) / max(float(f.num_pos), 1) for f in frames])
    assert abs(local - want_pos) > 1e-6

    # centernet_normalize agrees with the hand math for a single frame
    d = centernet_normalize(frames[0], frames[0].num_pos, frames[0].reg_cnt)
    np.testing.assert_allclose(
        float(d["loss_centernet_agn_pos"]), float(frames[0].pos) / max(n0, 1),
        rtol=1e-6)


@pytest.mark.slow
def test_sharded_step_loss_equals_single_device_big_batch(rng):
    """DP equality: the 8-virtual-device sharded train step produces the
    same losses as one device running the full batch (the discipline of the
    DD-PPO equality test). This certifies the CenterNet normalizers are
    batch-global, not per-shard (ref: centernet.py:258-265)."""
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel import (
        make_mesh, shard_batch, replicate)
    from embodied_object_detection_tpu.parallel.train_step import (
        make_train_step, jit_train_step, TrainBatch)

    cfg = tiny_config()
    cfg = cfg.replace(centernet=dataclasses.replace(
        cfg.centernet, post_nms_topk_train=32, pre_nms_topk_train=128))
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)

    b = 8
    h, w = cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    # unbalanced positive counts across shards — the case local
    # normalization gets wrong
    for i in range(b):
        n = 1 + i % 3
        for j in range(n):
            gt_boxes[i, j] = [10 + 12 * j, 10 + 10 * j, 70 + 12 * j, 62 + 10 * j]
            gt_valid[i, j] = True
    batch = TrainBatch(
        image=rng.randint(0, 255, (b, h, w, 3)).astype(np.float32),
        proj_indices=rng.randint(0, cfg.memory.max_cells, (b, h, w)).astype(np.int32),
        mem_features=np.zeros((b, cfg.memory.max_cells, cfg.memory.memory_dim),
                              np.float32),
        mem_obs=np.zeros((b, cfg.memory.max_cells), np.float32),
        gt_boxes=gt_boxes,
        gt_classes=np.zeros((b, g), np.int32),
        gt_valid=gt_valid,
        weight=np.ones((b,), np.float32),
    )
    zs = rng.randn(cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1).astype(np.float32)

    # single device, full batch (forward loss only — same math the step
    # differentiates)
    single = jax.jit(step_fn.loss_fn)(
        state.params, jax.tree_util.tree_map(jnp.asarray, batch),
        jnp.asarray(zs), state.step)

    mesh = make_mesh()
    with mesh:
        batch_d = shard_batch(mesh, batch)
        params_d = replicate(mesh, state.params)
        zs_d = replicate(mesh, jnp.asarray(zs))
        sharded = jax.jit(step_fn.loss_fn)(params_d, batch_d, zs_d, state.step)

    t0, l0 = jax.tree_util.tree_map(float, single)
    t1, l1 = jax.tree_util.tree_map(float, sharded)
    assert set(l0) == set(l1)
    for k in l0:
        np.testing.assert_allclose(l0[k], l1[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(t0, t1, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_knobs_are_identity(rng):
    """backbone.train_remat / roi.train_stage_remat only re-schedule
    recompute (jax.checkpoint) — losses and gradients are unchanged
    (the train-step byte-diet experiment, VERDICT r3 #5)."""
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim,
                               cfg.roi.num_classes + 1).astype(np.float32))
    cells = cfg.memory.max_cells
    memf = jnp.zeros((cells, cfg.memory.memory_dim), jnp.float32)
    memo = jnp.zeros((cells,), jnp.float32)
    proj = jnp.asarray(rng.randint(0, cells, (h, w)).astype(np.int32))
    gt = GroundTruth(
        boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
        classes=jnp.asarray([1], jnp.int32), valid=jnp.ones(1, bool))

    def total(p, c):
        m = EmbodiedDetector(c)
        losses = m.apply(p, img, zs, memf, memo, proj, gt,
                         jax.random.PRNGKey(1),
                         method=EmbodiedDetector.frame_train)
        return sum(losses.values())

    base, gbase = jax.value_and_grad(total)(params, cfg)
    for variant in (
        cfg.replace(backbone=dataclasses.replace(cfg.backbone,
                                                 train_remat=True)),
        cfg.replace(roi=dataclasses.replace(cfg.roi,
                                            train_stage_remat=True)),
    ):
        v, gv = jax.value_and_grad(total)(params, variant)
        np.testing.assert_allclose(float(v), float(base), rtol=1e-6)
        ga = {jax.tree_util.keystr(p): a for p, a in
              jax.tree_util.tree_leaves_with_path(gbase)}
        gb = {jax.tree_util.keystr(p): a for p, a in
              jax.tree_util.tree_leaves_with_path(gv)}
        assert set(ga) == set(gb)
        for k in ga:
            np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(ga[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_train_resume_equivalence(tmp_path):
    """4 straight iterations == 2 iterations + checkpoint-resume + 2 more.

    The resume contract (DetectionCheckpointer.resume_or_load,
    train_mp3d.py:524-527): optimizer moments, iteration counter,
    scheduler phase and the (seed, iteration)-keyed data stream all
    continue exactly where the interrupted run stopped — same op
    sequence on the same batches, so the final states must match
    bitwise-close."""
    import jax
    from embodied_object_detection_tpu.data import (
        EpisodeDataset, generate_synthetic_dataset)
    from embodied_object_detection_tpu.engine.train import train
    from embodied_object_detection_tpu.models.detector import build_detector

    root = str(tmp_path / "synth")
    generate_synthetic_dataset(root, num_scenes=1, chunks_per_scene=2,
                               frames=4, height=128, width=160,
                               map_h=8, map_w=8, seed=0)

    base = tiny_config()
    base = base.replace(
        input=dataclasses.replace(base.input, max_sequence_length=4,
                                  score_every=2),
        solver=dataclasses.replace(base.solver, ims_per_batch=1,
                                   checkpoint_period=2))
    model, params = build_detector(base, jax.random.PRNGKey(0))
    ds = EpisodeDataset(root, max_sequence_length=4, max_gt=8)
    zs = np.random.RandomState(0).randn(
        base.roi.zs_weight_dim, base.roi.num_classes + 1).astype(np.float32)

    cfg_a = base.replace(output_dir=str(tmp_path / "a"))
    # eval_fn schedule (reference semantics): periodic in-loop evals skip
    # the final iteration because one full eval ALWAYS runs after the loop
    # (train_mp3d.py:646-648 guard + :757-759 do_test after do_train) —
    # callers aligning max_iter with eval_period must still get the final
    # eval. eval_fn mutates nothing, so run A stays bitwise-comparable.
    eval_steps = []
    state_a = train(model, params, cfg_a, ds, zs, max_iter=4, verbose=False,
                    eval_fn=lambda s: eval_steps.append(int(s.step)),
                    eval_period=2)
    assert eval_steps == [2, 4]

    cfg_b = base.replace(output_dir=str(tmp_path / "b"))
    train(model, params, cfg_b, ds, zs, max_iter=2, verbose=False)
    state_b = train(model, params, cfg_b, ds, zs, max_iter=4, resume=True,
                    verbose=False)

    assert int(state_a.step) == int(state_b.step) == 4
    flat_a, tree_a = jax.tree_util.tree_flatten(state_a)
    flat_b, tree_b = jax.tree_util.tree_flatten(state_b)
    assert tree_a == tree_b
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=0, atol=0)
