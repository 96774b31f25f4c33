"""CLIP-L / T5 encoder parity vs transformers torch models (CPU oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.config import CLIPTextConfig, T5Config
from textflux_tpu.io.params import convert_clip_state_dict, convert_t5_state_dict
from textflux_tpu.models.clip import clip_encode, init_clip_params
from textflux_tpu.models.t5 import init_t5_params, relative_position_buckets, t5_encode

CLIP_TINY = CLIPTextConfig(
    vocab_size=100, hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
    max_positions=20, eos_token_id=99,
)
T5_TINY = T5Config(
    vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
    relative_attention_num_buckets=8, relative_attention_max_distance=16,
)


@pytest.fixture(scope="module")
def clip_oracle():
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    torch.manual_seed(3)
    cfg = HFConfig(
        vocab_size=CLIP_TINY.vocab_size,
        hidden_size=CLIP_TINY.hidden_dim,
        intermediate_size=CLIP_TINY.mlp_dim,
        num_hidden_layers=CLIP_TINY.num_layers,
        num_attention_heads=CLIP_TINY.num_heads,
        max_position_embeddings=CLIP_TINY.max_positions,
        hidden_act="quick_gelu",
        eos_token_id=CLIP_TINY.eos_token_id,
        bos_token_id=98,
        pad_token_id=0,
    )
    return CLIPTextModel(cfg).eval()


@pytest.fixture(scope="module")
def t5_oracle():
    import torch
    from transformers import T5Config as HFConfig, T5EncoderModel

    torch.manual_seed(4)
    cfg = HFConfig(
        vocab_size=T5_TINY.vocab_size,
        d_model=T5_TINY.d_model,
        d_kv=T5_TINY.d_kv,
        d_ff=T5_TINY.d_ff,
        num_layers=T5_TINY.num_layers,
        num_heads=T5_TINY.num_heads,
        relative_attention_num_buckets=T5_TINY.relative_attention_num_buckets,
        relative_attention_max_distance=T5_TINY.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    return T5EncoderModel(cfg).eval()


def test_clip_parity(clip_oracle, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in clip_oracle.state_dict().items()}
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                          convert_clip_state_dict(sd, CLIP_TINY))

    ids = rng.integers(1, 90, size=(2, 12))
    ids[:, 0] = 98
    ids[0, 5] = CLIP_TINY.eos_token_id   # EOS mid-sequence
    ids[1, 11] = CLIP_TINY.eos_token_id
    with torch.no_grad():
        out = clip_oracle(torch.from_numpy(ids))
        ref_h = out.last_hidden_state.numpy()
        ref_pooled = out.pooler_output.numpy()

    h, pooled = clip_encode(params, CLIP_TINY, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-5)


def test_clip_parity_legacy_eos_config(rng):
    """Stock FLUX text_encoder configs ship the historically wrong
    eos_token_id=2 (pre transformers PR #24773); the reference pools at
    argmax(input_ids) in that case — the EOT position, since EOT is the
    vocab's largest id. Matching on id==2 (which never appears) would
    silently pool BOS; this pins the legacy branch against the oracle."""
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    tiny = CLIPTextConfig(
        vocab_size=100, hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
        max_positions=20, eos_token_id=2,
    )
    torch.manual_seed(5)
    oracle = CLIPTextModel(HFConfig(
        vocab_size=tiny.vocab_size, hidden_size=tiny.hidden_dim,
        intermediate_size=tiny.mlp_dim, num_hidden_layers=tiny.num_layers,
        num_attention_heads=tiny.num_heads,
        max_position_embeddings=tiny.max_positions, hidden_act="quick_gelu",
        eos_token_id=2, bos_token_id=98, pad_token_id=0,
    )).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                          convert_clip_state_dict(sd, tiny))

    # realistic stream: BOS, body tokens, EOT (=vocab max id 99), padding —
    # token id 2 itself never appears, exactly the real-checkpoint situation
    ids = rng.integers(3, 90, size=(2, 12))
    ids[:, 0] = 98
    ids[0, 5] = 99
    ids[0, 6:] = 0
    ids[1, 11] = 99
    with torch.no_grad():
        out = oracle(torch.from_numpy(ids))
        ref_pooled = out.pooler_output.numpy()
    _, pooled = clip_encode(params, tiny, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-5)
    # and the pooled rows must differ from BOS pooling (the bug this guards)
    h, _ = clip_encode(params, tiny, jnp.asarray(ids))
    assert not np.allclose(np.asarray(pooled), np.asarray(h)[:, 0])


def test_t5_buckets_match_reference():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    s = 16
    ctx = torch.arange(s)[:, None]
    mem = torch.arange(s)[None, :]
    ref = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True,
        num_buckets=T5_TINY.relative_attention_num_buckets,
        max_distance=T5_TINY.relative_attention_max_distance,
    ).numpy()
    ours = np.asarray(relative_position_buckets(
        s, T5_TINY.relative_attention_num_buckets, T5_TINY.relative_attention_max_distance))
    np.testing.assert_array_equal(ours, ref)


def test_t5_parity(t5_oracle, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in t5_oracle.state_dict().items()}
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                          convert_t5_state_dict(sd, T5_TINY))

    ids = rng.integers(1, 99, size=(2, 10))
    mask = np.ones((2, 10), np.int32)
    with torch.no_grad():
        ref = t5_oracle(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = t5_encode(params, T5_TINY, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


def test_init_shapes():
    cp = init_clip_params(jax.random.PRNGKey(0), CLIP_TINY)
    h, pooled = clip_encode(cp, CLIP_TINY, jnp.zeros((1, 8), jnp.int32))
    assert h.shape == (1, 8, 32) and pooled.shape == (1, 32)

    tp = init_t5_params(jax.random.PRNGKey(0), T5_TINY)
    out = t5_encode(tp, T5_TINY, jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, 32)
