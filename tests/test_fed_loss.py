"""Federated loss + softmax-CE wiring (VERDICT r3 #2).

Oracle: detic_fast_rcnn.py:201-266 (sigmoid CE with fed-loss class masking,
weighted softmax CE) and get_fed_loss_inds (detic/modeling/utils.py:16-29)
re-derived in torch (tests/torch_frame_oracle.py). Covers (a) loss value
parity under a fixed class mask, (b) the multinomial-without-replacement
sampling distribution vs the Gumbel top-k, (c) slot accounting with the
background class, (d) that flipping each config knob changes the training
loss end-to-end through frame_train.
"""

import dataclasses
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))

from torch_frame_oracle import (torch_cls_loss,  # noqa: E402
                                torch_get_fed_loss_inds)
from common import tiny_config  # noqa: E402

from embodied_object_detection_tpu.models.losses import (  # noqa: E402
    MatchedProposals, fed_loss_class_weight, stage_losses)


def _matched(rng, n, c, bg_frac=0.7):
    gt_classes = rng.randint(0, c + 1, n).astype(np.int32)
    gt_classes[rng.rand(n) < bg_frac] = c
    valid = np.ones(n, bool)
    boxes = rng.rand(n, 4).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2] + 1.0
    return MatchedProposals(boxes=jnp.asarray(boxes),
                            gt_boxes=jnp.asarray(boxes),
                            gt_classes=jnp.asarray(gt_classes),
                            valid=jnp.asarray(valid)), gt_classes


def test_sigmoid_ce_fed_mask_matches_torch(rng):
    n, c = 64, 12
    m, gt_classes = _matched(rng, n, c)
    logits = rng.randn(n, c + 1).astype(np.float32)
    mask = (rng.rand(c) > 0.5).astype(np.float32)
    out = stage_losses(jnp.asarray(logits), jnp.zeros((n, 4), jnp.float32),
                       m, (10.0, 10.0, 5.0, 5.0), c,
                       class_weight=jnp.asarray(mask), use_sigmoid_ce=True)
    want = torch_cls_loss(torch.from_numpy(logits),
                          torch.from_numpy(gt_classes).long(), c,
                          class_mask=torch.from_numpy(mask),
                          use_sigmoid_ce=True)
    np.testing.assert_allclose(float(out["loss_cls"]), float(want),
                               rtol=1e-5)


def test_softmax_ce_matches_torch(rng):
    n, c = 48, 9
    m, gt_classes = _matched(rng, n, c)
    logits = rng.randn(n, c + 1).astype(np.float32)
    # plain branch
    out = stage_losses(jnp.asarray(logits), jnp.zeros((n, 4), jnp.float32),
                       m, (10.0, 10.0, 5.0, 5.0), c, use_sigmoid_ce=False)
    want = torch_cls_loss(torch.from_numpy(logits),
                          torch.from_numpy(gt_classes).long(), c,
                          use_sigmoid_ce=False)
    np.testing.assert_allclose(float(out["loss_cls"]), float(want),
                               rtol=1e-5)
    # fed-weighted branch: torch's weighted mean divides by the sum of the
    # per-target weights, not the row count
    mask = (rng.rand(c) > 0.4).astype(np.float32)
    out_w = stage_losses(jnp.asarray(logits), jnp.zeros((n, 4), jnp.float32),
                         m, (10.0, 10.0, 5.0, 5.0), c,
                         class_weight=jnp.asarray(mask),
                         use_sigmoid_ce=False)
    want_w = torch_cls_loss(torch.from_numpy(logits),
                            torch.from_numpy(gt_classes).long(), c,
                            class_mask=torch.from_numpy(mask),
                            use_sigmoid_ce=False)
    np.testing.assert_allclose(float(out_w["loss_cls"]), float(want_w),
                               rtol=1e-5)
    assert float(out_w["loss_cls"]) != pytest.approx(float(out["loss_cls"]))


def test_fed_mask_slot_accounting_with_background():
    """Background appearing among the matched classes consumes one of the
    num_sample_cats slots but is excluded from the [C] foreground mask —
    torch.unique over gt_classes incl. C (detic/modeling/utils.py:17)."""
    c, k = 30, 10
    gt = jnp.asarray(np.array([2, 5, c, c, c], np.int32))   # bg appears
    valid = jnp.ones(5, bool)
    freq = jnp.ones(c, jnp.float32)
    w = np.asarray(fed_loss_class_weight(gt, valid, freq, k, c,
                                         jax.random.PRNGKey(0)))
    assert w[2] == 1 and w[5] == 1
    assert w.sum() == k - 1          # bg took one slot
    # without bg rows: full k foreground classes
    gt2 = jnp.asarray(np.array([2, 5, 5, 7, 7], np.int32))
    w2 = np.asarray(fed_loss_class_weight(gt2, valid, freq, k, c,
                                          jax.random.PRNGKey(0)))
    assert w2.sum() == k


def test_fed_mask_more_appeared_than_sample_cats():
    """#appeared >= num_sample_cats: the reference draws no extras and keeps
    every appeared class (the `if len(appeared) < num_sample_cats` guard)."""
    c, k = 20, 4
    gt = jnp.asarray(np.arange(8, dtype=np.int32))
    valid = jnp.ones(8, bool)
    freq = jnp.ones(c, jnp.float32)
    w = np.asarray(fed_loss_class_weight(gt, valid, freq, k, c,
                                         jax.random.PRNGKey(3)))
    assert w.sum() == 8 and np.all(w[:8] == 1)


def test_fed_sampling_distribution_matches_multinomial(rng):
    """Gumbel top-k over log-frequencies == torch.multinomial without
    replacement (the Gumbel-max trick): per-class selection frequencies of
    the random extras agree over many draws."""
    c, k = 16, 6
    gt_np = np.array([0, 1, c], np.int32)    # classes 0,1 + bg appeared
    freq = (np.arange(c) + 1.0).astype(np.float32) ** 1.5  # skewed
    trials = 4000

    counts_j = np.zeros(c)
    gt_j, valid_j = jnp.asarray(gt_np), jnp.ones(3, bool)
    freq_j = jnp.asarray(freq)
    sample = jax.jit(lambda r: fed_loss_class_weight(
        gt_j, valid_j, freq_j, k, c, r))
    base = jax.random.PRNGKey(7)
    for i in range(trials):
        counts_j += np.asarray(sample(jax.random.fold_in(base, i)))

    counts_t = np.zeros(c)
    gen = torch.Generator().manual_seed(7)
    gt_t = torch.from_numpy(gt_np).long()
    freq_t = torch.from_numpy(freq)
    for _ in range(trials):
        inds = torch_get_fed_loss_inds(gt_t, k, c, freq_t, generator=gen)
        mask = np.zeros(c + 1)
        mask[inds.numpy()] = 1
        counts_t += mask[:c]

    # appeared fg classes always selected in both
    assert counts_j[0] == trials and counts_j[1] == trials
    assert counts_t[0] == trials and counts_t[1] == trials
    # same number of extras per draw (k - 3 appeared)
    assert counts_j.sum() == counts_t.sum() == trials * (k - 1)
    # extras' per-class selection probability agrees (binomial std ~ 0.008)
    p_j = counts_j[2:] / trials
    p_t = counts_t[2:] / trials
    np.testing.assert_allclose(p_j, p_t, atol=0.04)


@pytest.mark.slow
def test_knobs_change_frame_train_loss(rng):
    """Flipping use_fed_loss / use_sigmoid_ce changes loss_cls end-to-end
    through EmbodiedDetector.frame_train (the r3 dead-knob fix)."""
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import GroundTruth

    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    c = cfg.roi.num_classes
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim, c + 1)
                     .astype(np.float32))
    cells = cfg.memory.max_cells
    memf = jnp.zeros((cells, cfg.memory.memory_dim), jnp.float32)
    memo = jnp.zeros((cells,), jnp.float32)
    proj = jnp.asarray(rng.randint(0, cells, (h, w)).astype(np.int32))
    gt = GroundTruth(
        boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0], [4.0, 20.0, 30.0, 60.0]]),
        classes=jnp.asarray([1, 3], jnp.int32),
        valid=jnp.ones(2, bool))
    freq = jnp.asarray((np.arange(c) + 1.0).astype(np.float32))

    def run(model_cfg, **kw):
        m = EmbodiedDetector(model_cfg)
        return m.apply(params, img, zs, memf, memo, proj, gt,
                       jax.random.PRNGKey(1),
                       method=EmbodiedDetector.frame_train, **kw)

    base = run(cfg)
    # fed_loss_num_cat must be < num_classes or every class is sampled and
    # the mask is all-ones (the default 50 over the tiny 5-class vocab)
    fed_cfg = cfg.replace(roi=dataclasses.replace(cfg.roi, use_fed_loss=True,
                                                  fed_loss_num_cat=2))
    fed = run(fed_cfg, fed_freq_weight=freq)
    soft_cfg = cfg.replace(
        roi=dataclasses.replace(cfg.roi, use_sigmoid_ce=False))
    soft = run(soft_cfg)

    for k in ("loss_cls_stage0", "loss_cls_stage1", "loss_cls_stage2"):
        assert float(fed[k]) != pytest.approx(float(base[k])), k
        assert float(soft[k]) != pytest.approx(float(base[k])), k
    # box reg unaffected by the classification knobs
    for k in ("loss_box_reg_stage0",):
        assert float(fed[k]) == pytest.approx(float(base[k]), rel=1e-6)
        assert float(soft[k]) == pytest.approx(float(base[k]), rel=1e-6)
    # fed loss without a freq table falls back to unmasked
    # (`self.freq_weight is not None`, detic_fast_rcnn.py:214)
    fed_none = run(fed_cfg)
    for k in ("loss_cls_stage0",):
        assert float(fed_none[k]) == pytest.approx(float(base[k]), rel=1e-6)


def test_ignore_zero_cats_matches_torch(rng):
    """IGNORE_ZERO_CATS zeroes classes with ~zero image counts: multiplies
    into the fed mask in the sigmoid branch (detic_fast_rcnn.py:225-228),
    takes precedence in the softmax branch (:244-251)."""
    n, c = 40, 8
    m, gt_classes = _matched(rng, n, c)
    logits = rng.randn(n, c + 1).astype(np.float32)
    freq = np.asarray([0.0, 5, 3, 0.0, 9, 1, 0.0, 2], np.float32)
    zw = (freq > 1e-4).astype(np.float32)
    # sigmoid: weight = zw alone (no fed mask)
    out = stage_losses(jnp.asarray(logits), jnp.zeros((n, 4), jnp.float32),
                       m, (10.0, 10.0, 5.0, 5.0), c,
                       class_weight=jnp.asarray(zw), use_sigmoid_ce=True)
    want = torch_cls_loss(torch.from_numpy(logits),
                          torch.from_numpy(gt_classes).long(), c,
                          class_mask=torch.from_numpy(zw),
                          use_sigmoid_ce=True)
    np.testing.assert_allclose(float(out["loss_cls"]), float(want),
                               rtol=1e-5)
    # softmax: torch weighted CE with zw + bg=1
    out_s = stage_losses(jnp.asarray(logits), jnp.zeros((n, 4), jnp.float32),
                         m, (10.0, 10.0, 5.0, 5.0), c,
                         class_weight=jnp.asarray(zw), use_sigmoid_ce=False)
    want_s = torch_cls_loss(torch.from_numpy(logits),
                            torch.from_numpy(gt_classes).long(), c,
                            class_mask=torch.from_numpy(zw),
                            use_sigmoid_ce=False)
    np.testing.assert_allclose(float(out_s["loss_cls"]), float(want_s),
                               rtol=1e-5)


@pytest.mark.slow
def test_ignore_zero_cats_knob_changes_loss(rng):
    """Flipping roi.ignore_zero_cats changes loss_cls end-to-end through
    frame_train when the freq table has zero-count classes."""
    from embodied_object_detection_tpu.models.detector import (
        EmbodiedDetector, build_detector)
    from embodied_object_detection_tpu.structures import GroundTruth

    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input.height, cfg.input.width
    c = cfg.roi.num_classes
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.float32))
    zs = jnp.asarray(rng.randn(cfg.roi.zs_weight_dim, c + 1)
                     .astype(np.float32))
    cells = cfg.memory.max_cells
    memf = jnp.zeros((cells, cfg.memory.memory_dim), jnp.float32)
    memo = jnp.zeros((cells,), jnp.float32)
    proj = jnp.asarray(rng.randint(0, cells, (h, w)).astype(np.int32))
    gt = GroundTruth(boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
                     classes=jnp.asarray([1], jnp.int32),
                     valid=jnp.ones(1, bool))
    freq = np.ones(c, np.float32)
    freq[0] = freq[2] = 0.0                     # zero-count classes

    def run(model_cfg, **kw):
        mm = EmbodiedDetector(model_cfg)
        return mm.apply(params, img, zs, memf, memo, proj, gt,
                        jax.random.PRNGKey(1),
                        method=EmbodiedDetector.frame_train, **kw)

    base = run(cfg, fed_freq_weight=jnp.asarray(freq))
    izc_cfg = cfg.replace(
        roi=dataclasses.replace(cfg.roi, ignore_zero_cats=True))
    izc = run(izc_cfg, fed_freq_weight=jnp.asarray(freq))
    assert float(izc["loss_cls_stage0"]) != \
        pytest.approx(float(base["loss_cls_stage0"]))
    # without a freq table the knob is inert (freq_weight is None guard)
    izc_none = run(izc_cfg)
    assert float(izc_none["loss_cls_stage0"]) == \
        pytest.approx(float(base["loss_cls_stage0"]), rel=1e-6)


def test_zero_freq_classes_never_sampled(rng):
    """torch.multinomial gives zero-weight classes probability exactly 0;
    the Gumbel keys must be -inf for them, not log(1e-20)."""
    c = 10
    freq = np.zeros(c, np.float32)
    freq[:4] = [3.0, 1.0, 2.0, 5.0]            # classes 4..9 have freq 0
    gt = jnp.asarray([0], jnp.int32)
    valid = jnp.asarray([True])
    for seed in range(20):
        w = np.asarray(fed_loss_class_weight(
            gt, valid, jnp.asarray(freq), num_sample_cats=4,
            num_classes=c, rng=jax.random.PRNGKey(seed)))
        assert w[0] == 1.0                      # appeared
        assert (w[4:] == 0.0).all(), f"zero-freq class sampled (seed {seed})"


def test_fed_table_loading_rules(tmp_path):
    """load_fed_freq_weight: loads under ignore_zero_cats even when
    use_fed_loss is off (ref detic_fast_rcnn.py:85-89), zero-pads short
    tables (:91-97), and fails loudly when num_cat exceeds the
    positive-frequency class count."""
    import json
    from embodied_object_detection_tpu.engine.train import (
        load_fed_freq_weight)

    cfg = tiny_config()                         # num_classes=5
    cat_info = [dict(id=i + 1, image_count=int(cnt))
                for i, cnt in enumerate([4, 9, 0])]   # 3-entry short table
    p = tmp_path / "cat_info.json"
    p.write_text(json.dumps(cat_info))

    roi = dataclasses.replace(cfg.roi, ignore_zero_cats=True,
                              use_fed_loss=False, cat_freq_path=str(p))
    w = load_fed_freq_weight(cfg.replace(roi=roi))
    assert w is not None and w.shape == (5,)    # loaded + zero-padded
    assert w[0] > 0 and (w[2:] == 0).all()

    assert load_fed_freq_weight(cfg) is None    # both knobs off

    roi = dataclasses.replace(cfg.roi, use_fed_loss=True,
                              fed_loss_num_cat=4, cat_freq_path=str(p))
    with pytest.raises(ValueError, match="positive-frequency"):
        load_fed_freq_weight(cfg.replace(roi=roi))
