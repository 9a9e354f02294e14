"""Monodepth net parity vs an independent torch re-derivation.

ref: habitat_baselines/slambased/monodepth.py:263-499 (Hu et al. encoder-
decoder: R50 blocks -> D UpProjections + MFF multi-scale fusion -> R
refinement). The torch side below re-implements the architecture from its
definition; weights cross through rl.monodepth.convert_monodepth_torch
under the reference checkpoint's `module.E/D/MFF/R` naming.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TorchUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv1_2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn1_2 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x, size):
        x = tF.interpolate(x, size=size, mode="bilinear",
                           align_corners=False)
        b1 = self.bn1_2(self.conv1_2(tF.relu(self.bn1(self.conv1(x)))))
        b2 = self.bn2(self.conv2(x))
        return tF.relu(b1 + b2)


class TorchMonoDepth(tnn.Module):
    """Small-depth (1,1,1,1) instance of the reference architecture."""

    def __init__(self, depths=(1, 1, 1, 1)):
        super().__init__()
        from torch_frame_oracle import _TorchBottleneck
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        planes = (64, 128, 256, 512)
        self.layers = tnn.ModuleList()
        for stage, (depth, p) in enumerate(zip(depths, planes)):
            cin = 64 if stage == 0 else planes[stage - 1] * 4
            blocks = tnn.ModuleList()
            for i in range(depth):
                stride = (1 if stage == 0 else 2) if i == 0 else 1
                blocks.append(_TorchBottleneck(cin if i == 0 else p * 4, p,
                                               stride, downsample=(i == 0)))
            self.layers.append(blocks)
        nf = 2048
        self.d_conv = tnn.Conv2d(nf, nf // 2, 1, bias=False)
        self.d_bn = tnn.BatchNorm2d(nf // 2)
        self.d_ups = tnn.ModuleList(
            [TorchUp(nf // (2 << i), nf // (4 << i)) for i in range(4)])
        bc = (256, 512, 1024, 2048)
        self.mff_ups = tnn.ModuleList([TorchUp(c, 16) for c in bc])
        self.mff_conv = tnn.Conv2d(64, 64, 5, 1, 2, bias=False)
        self.mff_bn = tnn.BatchNorm2d(64)
        rf = 64 + bc[3] // 32
        self.r_conv0 = tnn.Conv2d(rf, rf, 5, 1, 2, bias=False)
        self.r_bn0 = tnn.BatchNorm2d(rf)
        self.r_conv1 = tnn.Conv2d(rf, rf, 5, 1, 2, bias=False)
        self.r_bn1 = tnn.BatchNorm2d(rf)
        self.r_conv2 = tnn.Conv2d(rf, 1, 5, 1, 2)
        self.eval()

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.max_pool2d(x, 3, 2, 1)
        feats = []
        for blocks in self.layers:
            for b in blocks:
                x = b(x)
            feats.append(x)
        b1, b2, b3, b4 = feats
        d = tF.relu(self.d_bn(self.d_conv(b4)))
        d = self.d_ups[0](d, (b3.shape[2], b3.shape[3]))
        d = self.d_ups[1](d, (b2.shape[2], b2.shape[3]))
        d = self.d_ups[2](d, (b1.shape[2], b1.shape[3]))
        d = self.d_ups[3](d, (b1.shape[2] * 2, b1.shape[3] * 2))
        size = (d.shape[2], d.shape[3])
        m = torch.cat([up(b, size) for up, b in
                       zip(self.mff_ups, (b1, b2, b3, b4))], dim=1)
        m = tF.relu(self.mff_bn(self.mff_conv(m)))
        y = torch.cat([d, m], dim=1)
        y = tF.relu(self.r_bn0(self.r_conv0(y)))
        y = tF.relu(self.r_bn1(self.r_conv1(y)))
        return self.r_conv2(y)[:, 0]

    def reference_state_dict(self):
        """Checkpoint naming (module.E/D/MFF/R, monodepth.py:636-662)."""
        sd = {}

        def put(name, t):
            sd["module." + name] = t.detach().numpy().copy()

        put("E.conv1.weight", self.conv1.weight)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            put(f"E.bn1.{leaf}", getattr(self.bn1, leaf))
        for stage, blocks in enumerate(self.layers):
            for i, b in enumerate(blocks):
                base = f"E.layer{stage + 1}.{i}"
                for j in (1, 2, 3):
                    put(f"{base}.conv{j}.weight",
                        getattr(b, f"conv{j}").weight)
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

        def put_up(prefix, up):
            for sub in ("conv1", "conv1_2", "conv2"):
                put(f"{prefix}.{sub}.weight", getattr(up, sub).weight)
            for sub in ("bn1", "bn1_2", "bn2"):
                bn = getattr(up, sub)
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    put(f"{prefix}.{sub}.{leaf}", getattr(bn, leaf))

        put("D.conv.weight", self.d_conv.weight)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            put(f"D.bn.{leaf}", getattr(self.d_bn, leaf))
        for i, up in enumerate(self.d_ups):
            put_up(f"D.up{i + 1}", up)
        for i, up in enumerate(self.mff_ups):
            put_up(f"MFF.up{i + 1}", up)
        put("MFF.conv.weight", self.mff_conv.weight)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            put(f"MFF.bn.{leaf}", getattr(self.mff_bn, leaf))
        for i in (0, 1):
            put(f"R.conv{i}.weight", getattr(self, f"r_conv{i}").weight)
            bn = getattr(self, f"r_bn{i}")
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                put(f"R.bn{i}.{leaf}", getattr(bn, leaf))
        put("R.conv2.weight", self.r_conv2.weight)
        put("R.conv2.bias", self.r_conv2.bias)
        return sd


def _randomize(model, seed):
    rng = np.random.RandomState(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                fan = float(np.prod(m.weight.shape[1:]))
                m.weight.copy_(torch.tensor(
                    rng.randn(*m.weight.shape).astype(np.float32)
                    / np.sqrt(fan)))
                if m.bias is not None:
                    m.bias.copy_(torch.tensor(
                        rng.randn(*m.bias.shape).astype(np.float32) * 0.1))
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(torch.tensor(
                    (rng.rand(m.num_features) + 0.5).astype(np.float32)))
                m.bias.copy_(torch.tensor(
                    (rng.randn(m.num_features) * 0.1).astype(np.float32)))
                m.running_mean.copy_(torch.tensor(
                    (rng.randn(m.num_features) * 0.1).astype(np.float32)))
                m.running_var.copy_(torch.tensor(
                    (rng.rand(m.num_features) + 0.5).astype(np.float32)))


def test_monodepth_vs_torch_oracle(rng):
    from embodied_object_detection_tpu.rl.monodepth import (
        MonoDepthNet, convert_monodepth_torch)

    tm = TorchMonoDepth()
    _randomize(tm, 3)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()[0]

    params = convert_monodepth_torch(tm.reference_state_dict())
    net = MonoDepthNet(depths=(1, 1, 1, 1))
    init = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((64, 96, 3), jnp.float32))
    # converted tree covers the full init tree (no missing/extra leaves)
    flat_init = {"/".join(map(str, p)): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(init)}
    flat_conv = {"/".join(map(str, p)): np.asarray(v).shape for p, v in
                 jax.tree_util.tree_leaves_with_path(params)}
    assert set(flat_init) == set(flat_conv), (
        sorted(set(flat_init) ^ set(flat_conv))[:8])
    for k in flat_init:
        assert tuple(flat_init[k]) == tuple(flat_conv[k]), k

    got = np.asarray(net.apply(params, jnp.asarray(x[0].transpose(1, 2, 0))))
    assert got.shape == want.shape == (32, 48)   # half input resolution
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_monodepth_estimator_end_to_end(rng):
    from embodied_object_detection_tpu.rl.monodepth import MonoDepthEstimator
    est = MonoDepthEstimator(depths=(1, 1, 1, 1))
    est.init(jax.random.PRNGKey(1), height=64, width=96)
    rgb = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
    depth = est.compute_depth(rgb)
    assert depth.shape == (64, 96)
    assert np.all(np.isfinite(depth))


def test_slam_agent_monodepth_fallback(rng):
    """DepthMapperAndPlannerAgent maps from monodepth-predicted depth when
    the obs carry only RGB (ref: ORBSLAM2MonodepthAgent,
    slam_agents.py:565-645)."""
    from embodied_object_detection_tpu.rl.sim import GridSimulator
    from embodied_object_detection_tpu.rl.slam import (
        DepthMapperAndPlannerAgent)

    class StubDepth:
        def compute_depth(self, rgb):
            return np.full(rgb.shape[:2], 1.5, np.float32)

    sim = GridSimulator(render_rgb=False)
    from embodied_object_detection_tpu.rl.core import Episode
    ep = Episode(episode_id="0", scene_id="mscene0",
                 start_position=np.asarray([6.0, 6.0], np.float32),
                 start_rotation=0.0)
    sim.reset(ep)
    agent = DepthMapperAndPlannerAgent(sim, monodepth=StubDepth())
    obs = {"rgb": rng.randint(0, 255, (32, 48, 3)).astype(np.uint8),
           "pointgoal_with_gps_compass": np.asarray([3.0, 0.2], np.float32)}
    before = agent._obstacle_counts.sum()
    a = agent.act(obs)
    assert a in (0, 1, 2, 3)
    assert agent._obstacle_counts.sum() > before   # the map got updates

    # without monodepth and without depth, the map stays untouched
    agent2 = DepthMapperAndPlannerAgent(sim)
    agent2.act(obs)
    assert agent2._obstacle_counts.sum() == 0
