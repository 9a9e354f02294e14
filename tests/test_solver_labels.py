"""Exhaustive solver param-labeling test over the FULL flagship tree
(VERDICT r1 weak #5: substring routing must be pinned by an independent
expectation, not a fixture)."""

import re

import jax
import pytest

from common import tiny_config


def expected_label(path: str) -> str:
    """Independent re-derivation of custom_solver.py:24-44 semantics:
    FrozenBN never trains; map_merge gets CUSTOM_MULTIPLIER; everything in
    the ResNet trunk gets BACKBONE_MULTIPLIER; the rest is default."""
    if re.search(r"/(running_mean|running_var)$", path):
        return "frozen"
    if re.search(r"/(bn\d|downsample_bn)/(weight|bias)$", path):
        return "frozen"
    if "map_merge_projection" in path:
        return "custom"
    if path.startswith("params/backbone/"):
        return "backbone"
    return "default"


@pytest.mark.slow
def test_full_flagship_tree_labels():
    from embodied_object_detection_tpu.config import SolverConfig
    from embodied_object_detection_tpu.engine.solver import param_labels
    from embodied_object_detection_tpu.models.detector import build_detector

    cfg = tiny_config()
    _, params = build_detector(cfg, jax.random.PRNGKey(0))
    labels = param_labels(params, SolverConfig())

    flat_labels = {}
    def collect(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        flat_labels[p] = leaf
    jax.tree_util.tree_map_with_path(collect, labels)

    assert len(flat_labels) > 100       # the real tree, not a fixture
    mismatches = {p: (l, expected_label(p)) for p, l in flat_labels.items()
                  if l != expected_label(p)}
    assert not mismatches, dict(list(mismatches.items())[:10])

    # sanity on group populations
    counts = {}
    for l in flat_labels.values():
        counts[l] = counts.get(l, 0) + 1
    assert counts["frozen"] > 100       # all FrozenBN stats + affines
    assert counts["custom"] == 6        # 3 map_merge projections x (k, b)
    assert counts["backbone"] > 50      # trunk convs
    assert counts["default"] > 50       # fpn/centernet/roi_heads
