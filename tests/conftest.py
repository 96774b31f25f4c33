"""Test configuration: force an 8-device CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (the reference never had distributed tests;
see SURVEY.md §4)."""

import os

# The harness environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on a multi-device CPU mesh, so override — setdefault is NOT enough.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"


def has_reference_diffusers() -> bool:
    return os.path.isdir(REFERENCE_DIFFUSERS)


@pytest.fixture(scope="session")
def torch_oracle():
    """Import the reference's vendored diffusers (torch CPU) as a numerical oracle.

    Used strictly for parity checks — the framework itself never imports torch
    or diffusers.
    """
    if not has_reference_diffusers():
        pytest.skip("reference diffusers not available")
    if REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, REFERENCE_DIFFUSERS)
    import torch  # noqa: F401
    import diffusers  # noqa: F401

    torch.manual_seed(0)
    return diffusers


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
