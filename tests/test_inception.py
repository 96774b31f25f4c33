"""InceptionV3 FID extractor: torch oracle parity (hand-built torchvision
inception_v3 graph with pytorch_fid's pooling modifications — torchvision
itself is not installed), converter fold-correctness, and FID harness wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.evaluation.inception import (
    convert_inception_state_dict,
    inception_pool3_features,
    init_inception_params,
    make_fid_extractor,
)


def _build_torch_fid_inception():
    """torchvision inception_v3 feature graph through Mixed_7c + global pool,
    with pytorch_fid's modifications (avg pools exclude padding; Mixed_7c's
    pool branch is a max pool). Mirrors torchvision module/key naming."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg3(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    class InceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            import torch
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avg3(x)),
            ], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class InceptionC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            return torch.cat([
                self.branch1x1(x),
                self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
                self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                    self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
                self.branch_pool(avg3(x)),
            ], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class InceptionE(nn.Module):
        def __init__(self, cin, max_pool_branch):
            super().__init__()
            self.max_pool_branch = max_pool_branch
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            dbl = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            dbl = torch.cat([self.branch3x3dbl_3a(dbl), self.branch3x3dbl_3b(dbl)], 1)
            pool = (F.max_pool2d(x, 3, stride=1, padding=1)
                    if self.max_pool_branch else avg3(x))
            return torch.cat([self.branch1x1(x), b3, dbl,
                              self.branch_pool(pool)], 1)

    class FIDInception(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280, max_pool_branch=False)
            self.Mixed_7c = InceptionE(2048, max_pool_branch=True)

        def forward(self, x):
            import torch.nn.functional as F
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                x = getattr(self, name)(x)
            return x.mean(dim=(2, 3))

    return FIDInception()


@pytest.fixture(scope="module")
def torch_net():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    net = _build_torch_fid_inception()
    # He init so signal propagates through all 94 conv layers (torch's default
    # init decays it to an input-independent fixed point), plus non-trivial BN
    # running stats so the converter's BN folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0.0, 0.02)
    return net.eval()


def test_pool3_parity_with_torch(torch_net, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    params = convert_inception_state_dict(sd)

    x = rng.uniform(-1.0, 1.0, (2, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        inception_pool3_features(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_resize_parity_with_torch_interpolate(torch_net, rng):
    """pytorch_fid resizes with F.interpolate(bilinear, align_corners=False);
    the extractor's internal resize must match, so features from a non-299
    input agree with torch resize -> torch net."""
    import torch
    import torch.nn.functional as F

    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    params = convert_inception_state_dict(sd)

    x = rng.uniform(-1.0, 1.0, (1, 3, 128, 160)).astype(np.float32)
    with torch.no_grad():
        xr = F.interpolate(torch.from_numpy(x), size=(299, 299),
                           mode="bilinear", align_corners=False)
        ref = torch_net(xr).numpy()
    ours = np.asarray(
        inception_pool3_features(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_fid_harness_with_inception_extractor(torch_net, rng):
    """fid_from_images with the InceptionV3 extractor: ~0 for identical sets,
    clearly larger for shifted ones. (BN-statted weights — raw random init
    produces near-dead features that can't discriminate.)"""
    from textflux_tpu.evaluation.fid import fid_from_images

    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    params = convert_inception_state_dict(sd)
    extractor = make_fid_extractor(params)
    real = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32) for _ in range(8)]
    fake_same = list(real)
    fake_diff = [np.clip(r + 0.5, -1, 1) for r in real]
    fid_same = fid_from_images(real, fake_same, extractor, batch_size=4)
    fid_diff = fid_from_images(real, fake_diff, extractor, batch_size=4)
    # identical sets: exactly equal stats; residual is eigh noise on the
    # rank-deficient 2048x2048 covariance
    assert abs(fid_same) < 0.05
    assert fid_diff > abs(fid_same) * 10
