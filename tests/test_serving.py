"""Batched + mesh-sharded serving tests on the 8-device CPU mesh."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from tests.helpers import tiny_pipeline
from textflux_tpu.parallel import partitioning as PT


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


def _inputs(rng, n=4):
    images = [Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8))
              for _ in range(n)]
    masks = []
    for _ in range(n):
        m = np.zeros((32, 48), np.uint8)
        m[8:20, 10:30] = 255
        masks.append(Image.fromarray(m))
    return images, masks


def test_generate_batch(pipe, rng):
    images, masks = _inputs(rng, 2)
    out = pipe.generate_batch(images, masks, [["a"], ["b"]],
                              height=32, width=48, num_inference_steps=1,
                              seed=0, dtype=jnp.float32, sampler="euler")
    assert len(out) == 2
    assert out[0].size == (48, 32)


def test_generate_batch_sharded_matches_unsharded(pipe, rng):
    images, masks = _inputs(rng, 4)
    words = [["w1"], ["w2"], ["w3"], ["w4"]]
    kw = dict(height=32, width=48, num_inference_steps=2, seed=3,
              dtype=jnp.float32, sampler="euler")
    ref = pipe.generate_batch(images, masks, words, **kw)

    mesh = PT.make_mesh((2, 2, 2))
    pipe.shard_for_serving(mesh)
    with mesh:
        out = pipe.generate_batch(images, masks, words, **kw)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2.0)
