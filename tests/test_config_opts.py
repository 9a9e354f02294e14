"""Config opts coercion + parity presets (yacs merge_from_list analog)."""

import numpy as np
import pytest

from embodied_object_detection_tpu.config import (DetectorConfig, apply_opts,
                                                  parity_config)


def test_opts_scalar_coercion():
    cfg = apply_opts(DetectorConfig(), [
        "roi.num_classes=7", "memory.map_feature_weight=2.5",
        "memory.write_memory=false", "compute_dtype=float32"])
    assert cfg.roi.num_classes == 7
    assert cfg.memory.map_feature_weight == 2.5
    assert cfg.memory.write_memory is False
    assert cfg.compute_dtype == "float32"


def test_opts_flat_tuple():
    cfg = apply_opts(DetectorConfig(), ["centernet.strides=8,16,32"])
    assert cfg.centernet.strides == (8, 16, 32)


def test_opts_nested_tuple():
    cfg = apply_opts(DetectorConfig(), [
        "centernet.sizes_of_interest=((0,80),(64,160),(128,10000))"])
    assert cfg.centernet.sizes_of_interest == \
        ((0, 80), (64, 160), (128, 10000))
    # element types follow the template (floats stay floats)
    cfg = apply_opts(DetectorConfig(), [
        "roi.cascade_bbox_reg_weights=((10,10,5,5),(20,20,10,10),(30,30,15,15))"])
    w = cfg.roi.cascade_bbox_reg_weights
    assert w[1] == (20.0, 20.0, 10.0, 10.0)
    assert all(isinstance(x, float) for x in w[0])


def test_parity_presets_match_reference_commands():
    """ref README.md:44-62 + detic/config.py:67 — configs 1-3 all run with
    the FPN memory merge OFF (MEMORY_TYPE image_only/image_only/'' — the
    timm.py:143 gate needs 'implicit_memory'); only config 4 reads memory,
    with MAP_FEATURE_WEIGHT 5."""
    for name in ("pretrained", "vanilla_training", "detic_finetuned"):
        cfg = parity_config(name)
        assert cfg.memory.memory_type == "image_only", name
        assert cfg.memory.exact_write_subsample, name
    c4 = parity_config("implicit_object_memory")
    assert c4.memory.memory_type == "implicit_memory"
    assert c4.memory.map_feature_weight == 5.0
    assert c4.memory.feat_fusion == "sum"
    assert c4.memory.exact_write_subsample


def test_explicit_zs_weight_fails_loudly(tmp_path):
    import argparse
    from embodied_object_detection_tpu.run import find_zs_weight
    args = argparse.Namespace(zs_weight=str(tmp_path / "nope.npy"),
                              data_path=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="does not exist"):
        find_zs_weight(args, 20)
    # wrong class count: no silent fallback to the vendored table
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((512, 6), np.float32))
    args.zs_weight = str(bad)
    with pytest.raises(ValueError, match="classes"):
        find_zs_weight(args, 20)


def test_pinned_knobs_fail_loudly():
    """Structural knobs the implementation hard-wires must raise when
    flipped — a knob that silently does nothing is worse than an absent
    one (validate_config, called from apply_opts and build_detector)."""
    with pytest.raises(NotImplementedError, match="only_proposal"):
        apply_opts(DetectorConfig(), ["centernet.only_proposal=false"])
    with pytest.raises(NotImplementedError, match="loc_loss_type"):
        apply_opts(DetectorConfig(), ["centernet.loc_loss_type=smooth_l1"])
    with pytest.raises(NotImplementedError, match="freeze_at"):
        apply_opts(DetectorConfig(), ["backbone.freeze_at=2"])
    with pytest.raises(NotImplementedError, match="mask_weight"):
        apply_opts(DetectorConfig(), ["roi.mask_weight=2.0"])


def test_solver_optimizer_and_scheduler_knobs():
    """solver.optimizer sgd/adamw and lr_scheduler multistep are honored
    (custom_solver.py:64-76, d2 WarmupMultiStepLR)."""
    import dataclasses
    import jax.numpy as jnp
    from embodied_object_detection_tpu.engine.solver import (
        build_optimizer, lr_schedule)

    base = DetectorConfig().solver
    ms = dataclasses.replace(base, lr_scheduler="warmup_multistep",
                             steps=(10, 20), gamma=0.1, warmup_iters=0,
                             warmup_factor=1.0, base_lr=1.0)
    sched = lr_schedule(ms)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(15)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01)

    params = {"params": {"roi": {"w": jnp.ones((3,))}}}
    grads = {"params": {"roi": {"w": jnp.ones((3,))}}}
    for name in ("sgd", "adamw"):
        tx = build_optimizer(params, dataclasses.replace(base,
                                                         optimizer=name))
        state = tx.init(params)
        upd, _ = tx.update(grads, state, params)
        assert float(jnp.sum(jnp.abs(upd["params"]["roi"]["w"]))) > 0
    with pytest.raises(NotImplementedError, match="optimizer"):
        build_optimizer(params, dataclasses.replace(base, optimizer="lamb"))
    with pytest.raises(NotImplementedError, match="scheduler"):
        lr_schedule(dataclasses.replace(base, lr_scheduler="linear"))


def test_test_type_typo_fails_loudly():
    """An unknown memory.test_type must not silently fall into the
    longterm else-branch of the episode scan."""
    with pytest.raises(ValueError, match="test_type"):
        apply_opts(DetectorConfig(), ["memory.test_type=epsodic"])


def test_memory_type_predicates_single_source():
    cfg = DetectorConfig()
    assert cfg.memory.reads_memory() and not cfg.memory.external_memory()
    import dataclasses
    gt = dataclasses.replace(cfg.memory, memory_type="semantic_gt")
    assert gt.reads_memory() and gt.external_memory()
    img = dataclasses.replace(cfg.memory, memory_type="image_only")
    assert not img.reads_memory() and not img.external_memory()
