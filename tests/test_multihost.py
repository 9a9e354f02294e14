"""Multi-host (2-process) distributed smoke + model-axis sharding tests.

ref: the reference's multi-machine path (train_mp3d.py:793-857 dist-url/
SLURM + DDP) — replaced by jax.distributed.initialize + a global mesh.
The 2-process test is the no-cluster analog of habitat's multi-process
VectorEnv tests (SURVEY §4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_eval_matches_serial(tmp_path):
    """evaluate_dataset_sharded across a 2-process global mesh reproduces
    the serial protocol's AP and image count (VERDICT r4 #6 — the last
    untested distributed surface, inference). Each process holds only its
    lanes' output shards; the engine all-gathers the detection payload per
    step (the AsyncPredictor result-queue drain analog,
    predictor.py:441-529)."""
    from embodied_object_detection_tpu.data import generate_synthetic_dataset

    root = str(tmp_path / "synth")
    # 3 scenes over 4 streams: covers empty-lane padding cross-process
    generate_synthetic_dataset(root, num_scenes=3, chunks_per_scene=2,
                               frames=4, height=64, width=96,
                               map_h=8, map_w=8)
    child = os.path.join(os.path.dirname(__file__), "multihost_eval_child.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, child, str(i), port, root],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              cwd=os.path.dirname(os.path.dirname(child)))
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    aps = []
    for out in outs:
        line = [l for l in out.splitlines() if "MULTIHOST_EVAL_OK" in l]
        assert line, out[-2000:]
        aps.append(float(line[0].split("AP=")[1].split()[0]))
    assert np.isfinite(aps[0])
    np.testing.assert_allclose(aps[0], aps[1], rtol=1e-9)


@pytest.mark.slow
def test_two_process_distributed_train_step():
    """One sharded train step over a 2-process jax.distributed CPU cluster;
    both processes must report the same finite global loss."""
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, child, str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              cwd=os.path.dirname(os.path.dirname(child)))
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if "MULTIHOST_OK" in l]
        assert line, out[-2000:]
        losses.append(float(line[0].split("total_loss=")[1]))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


@pytest.mark.slow
def test_model_axis_sharding_matches_replicated():
    """Sharding zs_weight over the model axis (parallel.mesh.shard_zs_weight)
    must not change the loss vs full replication (GSPMD semantics)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from embodied_object_detection_tpu.config import DetectorConfig
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel.mesh import (
        shard_batch, shard_zs_weight, replicate)
    from embodied_object_detection_tpu.parallel.train_step import (
        make_train_step, jit_train_step, TrainBatch)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
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

    b, h, w = 4, cfg.input.height, cfg.input.width
    g = cfg.input.max_gt_boxes
    rng = np.random.RandomState(0)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_valid = np.zeros((b, g), bool)
    gt_boxes[:, 0] = [8, 8, 40, 40]
    gt_valid[:, 0] = True
    batch = TrainBatch(
        image=rng.randint(0, 255, (b, h, w, 3)).astype(np.float32),
        proj_indices=rng.randint(0, 32, (b, h, w)).astype(np.int32),
        mem_features=np.zeros((b, 32, cfg.memory.memory_dim), np.float32),
        mem_obs=np.zeros((b, 32), np.float32),
        gt_boxes=gt_boxes, gt_classes=np.zeros((b, g), np.int32),
        gt_valid=gt_valid, weight=np.ones((b,), np.float32))
    zs = rng.randn(cfg.roi.zs_weight_dim,
                   cfg.roi.num_classes + 1).astype(np.float32)

    with mesh:
        batch_d = shard_batch(mesh, batch)
        zs_sharded = shard_zs_weight(mesh, jnp.asarray(zs))
        assert zs_sharded.sharding.spec == P(None, "model")
        replicated = NamedSharding(mesh, P())
        # no donation: the step runs twice from the same state
        step = jax.jit(step_fn, out_shardings=(replicated, replicated))
        state_d = replicate(mesh, state)
        _, losses_tp = step(state_d, batch_d, zs_sharded)
        loss_tp = float(losses_tp["total_loss"])
        _, losses_rep = step(state_d, batch_d,
                             replicate(mesh, jnp.asarray(zs)))
        loss_rep = float(losses_rep["total_loss"])
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=1e-5)


@pytest.mark.slow
def test_caption_negatives_span_global_batch():
    """The caption contrastive loss under a data-sharded jit sees the FULL
    global batch as negatives (the _sync_caption_features all_gather analog,
    custom_rcnn.py:294-307) — sharded result equals the single-device one."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from common import tiny_config
    from embodied_object_detection_tpu.models.detector import build_detector
    from embodied_object_detection_tpu.parallel.mesh import (
        shard_batch, replicate)
    from embodied_object_detection_tpu.parallel.train_step import (
        make_caption_train_step)

    cfg = tiny_config()
    model, params = build_detector(cfg, jax.random.PRNGKey(0))
    loss_fn = make_caption_train_step(model, cfg)

    b, h, w = 8, cfg.input.height, cfg.input.width
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)
    caps = rng.randn(b, cfg.roi.zs_weight_dim).astype(np.float32)
    weight = np.ones((b,), np.float32)

    # single device
    total_1, _ = jax.jit(loss_fn)(params, jnp.asarray(images),
                                  jnp.asarray(caps), jnp.asarray(weight))
    # 8-device data sharding: caption matrix row-sharded -> negatives require
    # the XLA-inserted all_gather
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    with mesh:
        rep = NamedSharding(mesh, P())
        sharded = jax.jit(loss_fn, out_shardings=(rep, rep))(
            replicate(mesh, params),
            *jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), NamedSharding(
                    mesh, P("data", *([None] * (x.ndim - 1))))),
                (images, caps, weight)))
    np.testing.assert_allclose(float(total_1), float(sharded[0]), rtol=2e-4)


@pytest.mark.slow
def test_two_process_ddppo_update():
    """One DD-PPO update over a 2-process cluster: both processes report
    the same globally-averaged losses (rl/ddppo shard_map semantics over
    a process-spanning mesh)."""
    child = os.path.join(os.path.dirname(__file__), "multihost_ddppo_child.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, child, str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              cwd=os.path.dirname(os.path.dirname(child)))
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    vals = []
    for out in outs:
        line = [l for l in out.splitlines() if "MULTIHOST_DDPPO_OK" in l]
        assert line, out[-2000:]
        vals.append([float(tok.split("=")[1]) for tok in line[0].split()[1:]])
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)


def test_model_axis_sharding_lvis_width():
    """tp zs_weight sharding at the width it exists for — LVIS C=1203
    (ref: detic/config.py 1203-class classifiers; VERDICT r2 #9). The
    column-sharded classifier matmul + sigmoid-CE loss + grads must match
    full replication bit-for-bit-ish on a dp x tp 4x2 mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from embodied_object_detection_tpu.models.roi_heads import (
        ZeroShotPredictor)
    from embodied_object_detection_tpu.parallel.mesh import shard_zs_weight

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    c, d, fc, r = 1203, 512, 64, 256
    rng = np.random.RandomState(0)
    zs = rng.randn(d, c + 1).astype(np.float32)
    zs[:, -1] = 0.0
    zs /= np.maximum(np.linalg.norm(zs, axis=0, keepdims=True), 1e-6)
    x = rng.randn(r, fc).astype(np.float32)
    targets = rng.randint(0, c + 1, (r,))
    onehot = np.zeros((r, c + 1), np.float32)
    onehot[np.arange(r), targets] = 1.0

    pred = ZeroShotPredictor(zs_dim=d, dtype=jnp.float32)
    params = pred.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(zs))

    def loss_fn(p, zsw):
        logits, _, _ = pred.apply(p, jnp.asarray(x), zsw)
        # fed-loss-style sigmoid CE over all C+1 columns
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * jnp.asarray(onehot) +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))

    vg = jax.jit(jax.value_and_grad(loss_fn),
                 out_shardings=(NamedSharding(mesh, P()),
                                NamedSharding(mesh, P())))
    with mesh:
        zs_tp = shard_zs_weight(mesh, jnp.asarray(zs))
        assert zs_tp.sharding.spec == P(None, "model")   # 1204 % 2 == 0
        l_tp, g_tp = vg(params, zs_tp)
        l_rep, g_rep = vg(params, jax.device_put(
            jnp.asarray(zs), NamedSharding(mesh, P())))
    np.testing.assert_allclose(float(l_tp), float(l_rep), rtol=1e-6)
    flat_tp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(g_tp)}
    flat_rep = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g_rep)}
    assert set(flat_tp) == set(flat_rep)
    for k in flat_tp:
        np.testing.assert_allclose(np.asarray(flat_tp[k]),
                                   np.asarray(flat_rep[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
