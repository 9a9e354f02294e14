"""Child process for the multi-host smoke test (launched by
test_multihost.py). Runs one tiny sharded train step over a 2-process
jax.distributed CPU cluster — the run.py --coordinator path's semantics
(ref: train_mp3d.py:747-752 DDP + :620-621 reduce_dict, replaced by a
global mesh + XLA collectives over the process boundary)."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main(process_id: int, port: str):
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel.train_step import (
        make_train_step, TrainBatch)

    devices = jax.devices()
    assert len(devices) == 4, devices          # 2 local per process
    mesh = Mesh(np.asarray(devices).reshape(4, 1), ("data", "model"))

    cfg = DetectorConfig()
    cfg = cfg.replace(
        compute_dtype="float32",
        input=dataclasses.replace(cfg.input, height=64, width=96,
                                  max_gt_boxes=4),
        centernet=dataclasses.replace(cfg.centernet, pre_nms_topk_train=64,
                                      post_nms_topk_train=16),
        roi=dataclasses.replace(cfg.roi, detections_per_image=8,
                                num_classes=5),
        memory=dataclasses.replace(cfg.memory, max_cells=32, write_topk=4),
    )
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    init_state, step_fn = make_train_step(model, cfg)
    state, _ = init_state(params)

    b_global, b_local = 4, 2
    h, w = cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    rng = np.random.RandomState(0)
    # deterministic global batch; each process materializes its own rows
    full = TrainBatch(
        image=rng.randint(0, 255, (b_global, h, w, 3)).astype(np.float32),
        proj_indices=rng.randint(0, cfg.memory.max_cells,
                                 (b_global, h, w)).astype(np.int32),
        mem_features=np.zeros((b_global, cfg.memory.max_cells,
                               cfg.memory.memory_dim), np.float32),
        mem_obs=np.zeros((b_global, cfg.memory.max_cells), np.float32),
        gt_boxes=np.tile(np.asarray([[8, 8, 40, 40]], np.float32),
                         (b_global, g, 1)).reshape(b_global, g, 4),
        gt_classes=np.zeros((b_global, g), np.int32),
        gt_valid=np.tile(np.asarray([True] + [False] * (g - 1)),
                         (b_global, 1)),
        weight=np.ones((b_global,), np.float32),
    )
    zs = np.random.RandomState(1).randn(
        cfg.roi.zs_weight_dim, cfg.roi.num_classes + 1).astype(np.float32)

    def to_global(x, spec):
        sharding = NamedSharding(mesh, spec)
        if spec == P():
            return jax.make_array_from_process_local_data(sharding, x)
        local = x[process_id * b_local: (process_id + 1) * b_local]
        return jax.make_array_from_process_local_data(sharding, local,
                                                      x.shape)

    with mesh:
        batch_d = jax.tree_util.tree_map(
            lambda x: to_global(x, P("data", *([None] * (x.ndim - 1)))), full)
        state_d = jax.tree_util.tree_map(lambda x: to_global(
            np.asarray(x), P()), state)
        zs_d = to_global(zs, P())
        replicated = NamedSharding(mesh, P())
        step = jax.jit(step_fn, out_shardings=(replicated, replicated))
        state_d, losses = step(state_d, batch_d, zs_d)
        # fully-replicated output: every process holds addressable shards
        total = float(np.asarray(
            losses["total_loss"].addressable_shards[0].data))
    assert np.isfinite(total), losses
    print(f"MULTIHOST_OK process={process_id} total_loss={total:.6f}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
