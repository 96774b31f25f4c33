"""LPIPS module tests: metric properties + torch-conv oracle for the AlexNet
stage math (torchvision isn't installed, so the conv stack is checked against
a hand-built torch equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.evaluation.lpips import (
    _ALEX,
    alexnet_features,
    convert_lpips_state_dict,
    init_lpips_params,
    lpips_distance,
)


def test_identity_is_zero(rng):
    params = init_lpips_params(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32).clip(-1, 1)
    d = lpips_distance(params, a, a)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_symmetry_and_positivity(rng):
    params = init_lpips_params(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32).clip(-1, 1)
    b = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32).clip(-1, 1)
    dab = float(lpips_distance(params, a, b)[0])
    dba = float(lpips_distance(params, b, a)[0])
    assert dab > 0 and abs(dab - dba) < 1e-6


def test_alexnet_stage_parity_with_torch(rng):
    import torch
    import torch.nn as nn

    # hand-build torch AlexNet.features to oracle the conv/pool math
    layers, c_in, conv_specs = [], 3, []
    for spec in _ALEX:
        if spec == "M":
            layers.append(nn.MaxPool2d(3, 2))
            continue
        out_ch, k, s, p = spec
        layers.append(nn.Conv2d(c_in, out_ch, k, s, p))
        layers.append(nn.ReLU())
        conv_specs.append((c_in, out_ch, k))
        c_in = out_ch
    torch.manual_seed(0)
    net = nn.Sequential(*layers).eval()

    sd = {}
    slice_idx, li, pos = 1, 0, 0
    # emulate lpips net.sliceN naming: slices split after each relu tap
    convs = [m for m in net if isinstance(m, nn.Conv2d)]
    for i, conv in enumerate(convs):
        sd[f"net.slice{i+1}.{i}.weight"] = conv.weight.detach().numpy()
        sd[f"net.slice{i+1}.{i}.bias"] = conv.bias.detach().numpy()
    for i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{i}.model.1.weight"] = np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32)

    params = convert_lpips_state_dict(sd)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = alexnet_features(params["net"], jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours[-1]), ref.transpose(0, 2, 3, 1), atol=1e-4)
