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
    try:
        with mesh:
            out = pipe.generate_batch(images, masks, words, **kw)
    finally:
        pipe.mesh = None  # module-scoped fixture: don't leak the mesh path
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2.0)


def test_generate_batch_matches_per_item(pipe, rng):
    """Per-sample RNG: a batched run must reproduce per-item __call__ outputs
    (the run_eval --batch-size contract), for euler AND overshoot."""
    images, masks = _inputs(rng, 3)
    words = [["alpha"], ["beta"], ["gamma"]]
    for sampler in ("euler", "overshoot"):
        batched = pipe.generate_batch(
            images, masks, words, height=32, width=48, num_inference_steps=2,
            seed=7, dtype=jnp.float32, sampler=sampler)
        for i in range(3):
            single = pipe(
                image=images[i], mask_image=masks[i], words=words[i],
                height=32, width=48, num_inference_steps=2, seed=7,
                dtype=jnp.float32, sampler=sampler)[0]
            np.testing.assert_allclose(
                np.asarray(batched[i], np.int16), np.asarray(single, np.int16),
                atol=1, err_msg=f"sampler={sampler} item={i}")


def test_generate_batch_seq_padding(pipe, rng):
    """seq_pad_multiple pads image tokens with masked keys; output unchanged."""
    images, masks = _inputs(rng, 2)
    words = [["a"], ["b"]]
    kw = dict(height=32, width=48, num_inference_steps=2, seed=5,
              dtype=jnp.float32, sampler="euler")
    ref = pipe.generate_batch(images, masks, words, **kw)
    padded = pipe.generate_batch(images, masks, words, seq_pad_multiple=256, **kw)
    for a, b in zip(ref, padded):
        np.testing.assert_allclose(np.asarray(a, np.int16), np.asarray(b, np.int16),
                                   atol=1)


def test_generate_batch_per_sample_seeds(pipe, rng):
    images, masks = _inputs(rng, 2)
    words = [["x"], ["x"]]
    out = pipe.generate_batch(images, masks, words, height=32, width=48,
                              num_inference_steps=1, seeds=[1, 2],
                              dtype=jnp.float32, sampler="euler")
    singles = [pipe(image=images[i], mask_image=masks[i], words=words[i],
                    height=32, width=48, num_inference_steps=1, seed=s,
                    dtype=jnp.float32, sampler="euler")[0]
               for i, s in enumerate([1, 2])]
    for a, b in zip(out, singles):
        np.testing.assert_allclose(np.asarray(a, np.int16), np.asarray(b, np.int16),
                                   atol=1)


def test_overshoot_c_changes_output(pipe, rng):
    images, masks = _inputs(rng, 1)
    kw = dict(image=images[0], mask_image=masks[0], words=["t"], height=32,
              width=48, num_inference_steps=2, seed=0, dtype=jnp.float32,
              sampler="overshoot")
    a = np.asarray(pipe(**kw, overshoot_c=0.5)[0], np.float32)
    b = np.asarray(pipe(**kw, overshoot_c=8.0)[0], np.float32)
    assert np.abs(a - b).max() > 0


@pytest.mark.parametrize("mode", ["w8a8", "nf4"])
def test_generate_batch_quantized_sharded_matches_unsharded(rng, mode):
    """shard_for_serving must handle quantized params: the w_q/w_q8a8/w_nf4
    + scale/absmax4 leaves take the dense spec's sharding
    (adapt_specs_to_params), and the tensor-sharded quantized pipeline
    matches the unsharded quantized one."""
    from textflux_tpu.io.quantize import quantize_tree
    from tests.helpers import tiny_pipeline

    qpipe = tiny_pipeline()
    qpipe.flux_params = quantize_tree(qpipe.flux_params, min_size=0,
                                      mode=mode)
    images, masks = _inputs(rng, 4)
    words = [["w1"], ["w2"], ["w3"], ["w4"]]
    kw = dict(height=32, width=48, num_inference_steps=2, seed=3,
              dtype=jnp.float32, sampler="euler")
    ref = qpipe.generate_batch(images, masks, words, **kw)

    mesh = PT.make_mesh((2, 2, 2))
    qpipe.shard_for_serving(mesh)
    with mesh:
        out = qpipe.generate_batch(images, masks, words, **kw)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2.0)
