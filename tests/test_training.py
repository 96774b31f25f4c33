"""Training step tests: selective unfreeze semantics, LoRA, loss sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.config import FluxConfig, VAEConfig
from textflux_tpu.models import vae as V
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.training import train as TR

VAE_TINY = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
                     norm_num_groups=4, scaling_factor=0.5, shift_factor=0.1)
FLUX_TINY = FluxConfig(
    in_channels=48, out_channels=16, num_double_layers=2, num_single_layers=3,
    num_heads=2, head_dim=8, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(4, 2, 2), time_embed_channels=256,
)
TC = TR.TrainConfig(grad_accum=2, remat=True, excluded_single_layers=(1,),
                    learning_rate=1e-3)


def _batch(rng, accum=2, b=1, h=32, w=32, t_txt=6):
    return {
        "pixel_values": jnp.asarray(rng.standard_normal((accum, b, h, w, 3)), jnp.float32) * 0.5,
        "mask": jnp.asarray((rng.random((accum, b, h, w)) > 0.8), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((accum, b, t_txt, 32)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((accum, b, 16)), jnp.float32),
    }


def test_attn_mask_structure():
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    mask = TR.attn_only_mask(params, FLUX_TINY, TC)
    assert jax.tree.structure(mask) == jax.tree.structure(params)
    # frozen: mods, mlps, embedders
    assert float(mask["double"]["img_mod"]["w"]) == 0.0
    assert float(mask["double"]["img_mlp"]["fc1"]["w"]) == 0.0
    assert float(mask["img_in"]["w"]) == 0.0
    # trainable: attention
    assert float(mask["double"]["img_qkv"]["w"]) == 1.0
    assert float(mask["double"]["txt_proj"]["w"]) == 1.0
    # single: qkv columns only, excluded layer 1 fully frozen
    w_mask = np.asarray(mask["single"]["linear1"]["w"])
    d = FLUX_TINY.hidden_dim
    assert w_mask.shape == (3, 1, 3 * d + FLUX_TINY.mlp_dim)
    assert w_mask[0, 0, : 3 * d].min() == 1.0
    assert w_mask[0, 0, 3 * d:].max() == 0.0
    assert w_mask[1].max() == 0.0
    assert np.asarray(mask["single"]["q_scale"])[1] == 0.0


def test_train_step_updates_only_trainable(rng):
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    mask = TR.attn_only_mask(params, FLUX_TINY, TC)
    tx = TR.make_optimizer(TC, mask)
    step = jax.jit(TR.make_train_step(FLUX_TINY, VAE_TINY, TC, tx, attn_impl="xla"))
    opt_state = tx.init(params)

    batch = _batch(rng)
    new_params, opt_state, metrics = step(params, opt_state, mask, vae_params,
                                          batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    # frozen leaves identical
    np.testing.assert_array_equal(np.asarray(new_params["double"]["img_mlp"]["fc1"]["w"]),
                                  np.asarray(params["double"]["img_mlp"]["fc1"]["w"]))
    np.testing.assert_array_equal(np.asarray(new_params["img_in"]["w"]),
                                  np.asarray(params["img_in"]["w"]))
    # attention weights moved
    assert np.abs(np.asarray(new_params["double"]["img_qkv"]["w"]) -
                  np.asarray(params["double"]["img_qkv"]["w"])).max() > 0
    # fused linear1: qkv columns moved, mlp columns frozen; excluded layer frozen
    d = FLUX_TINY.hidden_dim
    delta = np.asarray(new_params["single"]["linear1"]["w"]) - np.asarray(params["single"]["linear1"]["w"])
    assert np.abs(delta[0, :, : 3 * d]).max() > 0
    assert np.abs(delta[:, :, 3 * d:]).max() == 0
    assert np.abs(delta[1]).max() == 0


def test_lora_train_step(rng):
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    tc = TR.TrainConfig(grad_accum=1, lora_rank=4, lora_alpha=4.0, learning_rate=1e-3)
    lora = TR.lora_init(jax.random.PRNGKey(3), params, FLUX_TINY, tc.lora_rank)
    tx = TR.make_optimizer(tc)
    step = jax.jit(TR.make_lora_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla"))
    opt_state = tx.init(lora)

    batch = _batch(rng, accum=1)
    new_lora, opt_state, metrics = step(params, lora, opt_state, vae_params,
                                        batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    # B starts at zero => first update must move it
    assert np.abs(np.asarray(new_lora["double"]["img_qkv"]["b"])).max() > 0


def test_lora_merge_zero_b_is_identity(rng):
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    lora = TR.lora_init(jax.random.PRNGKey(1), params, FLUX_TINY, 4)
    merged = TR.lora_merge(params, lora, 1.0)
    np.testing.assert_array_equal(np.asarray(merged["double"]["img_qkv"]["w"]),
                                  np.asarray(params["double"]["img_qkv"]["w"]))


def test_prodigy_and_schedules(rng):
    import optax

    # prodigy runs with the reference's constant lr=1 (train_lora.sh)
    tc = TR.TrainConfig(optimizer="prodigy", learning_rate=1.0,
                        lr_scheduler="constant", max_train_steps=10)
    tx = TR.make_optimizer(tc)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)) * 0.1}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new["w"])).all()

    sched = TR.make_lr_schedule(TR.TrainConfig(lr_scheduler="linear",
                                               lr_warmup_steps=5, max_train_steps=20))
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(2e-5, rel=1e-5)


def test_trainable_leaves_stop_gradient_parity():
    """make_train_step(trainable_leaves=...) skips frozen weight-grad matmuls
    via stop_gradient; resulting params/loss must be identical to the full
    backward (frozen grads were masked to zero anyway)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.helpers import FLUX_TINY, VAE_TINY
    from textflux_tpu.models.transformer import init_flux_params
    from textflux_tpu.models.vae import init_vae_params
    from textflux_tpu.training import train as TR

    tc = TR.TrainConfig(grad_accum=2, excluded_single_layers=())
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    mask = TR.attn_only_mask(params, FLUX_TINY, tc)
    tx = TR.make_optimizer(tc, mask)
    trainable = jax.tree.map(TR.np_any_trainable, mask)

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((2, 1, 32, 32, 3)), jnp.float32),
        "mask": jnp.asarray((rng.random((2, 1, 32, 32)) > 0.8), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((2, 1, 6, 32)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    def run(step):
        opt_state = tx.init(params)
        p, _, metrics = jax.jit(step)(params, opt_state, mask, vae_params, batch, key)
        return p, float(metrics["loss"])

    p_full, l_full = run(TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla"))
    p_fast, l_fast = run(TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla",
                                            trainable_leaves=trainable))
    assert l_full == l_fast
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_insert_matches_merge_gradients(rng):
    """QLoRA formulation check: gradients of the flow-matching loss w.r.t. the
    LoRA factors are IDENTICAL whether the factors are folded into the base
    (lora_merge, reference semantics) or attached as a parallel low-rank
    branch (lora_insert, the trainable formulation) — same math, different
    association order (fp32 tolerance)."""
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    # f32 compute: this asserts merge==insert MATH; bf16 (the training
    # default) reassociates the two formulations' roundings apart
    tc = TR.TrainConfig(grad_accum=1, lora_rank=4, lora_alpha=8.0,
                        compute_dtype="float32")
    lora = TR.lora_init(jax.random.PRNGKey(3), params, FLUX_TINY, tc.lora_rank)
    # non-zero B so both branches actually contribute
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(9), x.shape), lora)
    scale = tc.lora_alpha / tc.lora_rank
    batch = jax.tree.map(lambda x: x[0], _batch(rng, accum=1))
    key = jax.random.PRNGKey(4)

    def loss_via(combine):
        def f(lora):
            return TR.flow_matching_loss(
                combine(params, lora, scale), FLUX_TINY, vae_params, VAE_TINY,
                tc, batch, key, attn_impl="xla")
        return jax.jit(jax.value_and_grad(f))(lora)

    l_merge, g_merge = loss_via(TR.lora_merge)
    l_insert, g_insert = loss_via(TR.lora_insert)
    np.testing.assert_allclose(float(l_merge), float(l_insert), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_merge), jax.tree.leaves(g_insert)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_qlora_step_over_quantized_base(rng):
    """The LoRA train step must run over an int8 weight-only frozen base
    (the single-chip 12B configuration) and move the factors."""
    from textflux_tpu.io.quantize import quantize_tree

    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    qbase = quantize_tree(params, min_size=0, mode="weight_only")
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    tc = TR.TrainConfig(grad_accum=1, lora_rank=4, lora_alpha=4.0,
                        learning_rate=1e-3)
    # init from the QUANTIZED base, exactly as cli/train.py --quantize-base
    # does (regression: lora_init used to require a "w" key and crashed)
    lora = TR.lora_init(jax.random.PRNGKey(3), qbase, FLUX_TINY, tc.lora_rank)
    tx = TR.make_optimizer(tc)
    step = jax.jit(TR.make_lora_train_step(FLUX_TINY, VAE_TINY, tc, tx,
                                           attn_impl="xla"))
    opt_state = tx.init(lora)
    new_lora, opt_state, metrics = step(qbase, lora, opt_state, vae_params,
                                        _batch(rng, accum=1), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(np.asarray(new_lora["double"]["img_qkv"]["b"])).max() > 0
    assert float(metrics["grad_norm"]) > 0


def test_lora_init_dims_on_any_base_layout():
    """lora_init must see identical factor shapes through every frozen-base
    layout the CLI can hand it (bf16 / int8 / w8a8 / packed NF4)."""
    w = jnp.zeros((3, 1, 16, 24), jnp.bfloat16)
    layouts = [
        {"w": w},
        {"w_q": w.astype(jnp.int8)},
        {"w_q8a8": w.astype(jnp.int8)},
        {"w_nf4": jnp.zeros((3, 1, 8, 24), jnp.uint8)},
    ]
    for lay in layouts:
        lead, d_in, d_out = TR.lora_target_dims(lay)
        assert (tuple(lead), d_in, d_out) == ((3, 1), 16, 24), lay.keys()
    with pytest.raises(KeyError):
        TR.lora_target_dims({"b": w})

    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    from textflux_tpu.io.quantize import quantize_tree

    ref = TR.lora_init(jax.random.PRNGKey(3), params, FLUX_TINY, 4)
    got = TR.lora_init(jax.random.PRNGKey(3),
                       quantize_tree(params, min_size=0, mode="weight_only"),
                       FLUX_TINY, 4)
    assert jax.tree.map(lambda a, b: a.shape == b.shape, ref, got)
    chex = jax.tree.leaves(jax.tree.map(lambda a, b: a.shape == b.shape, ref, got))
    assert all(chex)


def test_qlora_w8a8_base_raises(rng):
    """w8a8's activation-quant round() has zero gradient — LoRA over it must
    be rejected, not silently trained with a broken dL/dx."""
    from textflux_tpu.io.quantize import quantize_tree

    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    qbase = quantize_tree(params, min_size=0, mode="w8a8")
    lora = TR.lora_init(jax.random.PRNGKey(3), params, FLUX_TINY, 4)
    with pytest.raises(ValueError, match="w8a8"):
        TR.lora_insert(qbase, lora, 1.0)


def test_training_converges_on_fixed_batch(rng):
    """The stack LEARNS: overfitting one fixed batch with the full-param step
    must drive the flow-matching loss well below its start. Guards the whole
    chain (masked optimizer, remat backward, loss weighting) against
    silent-gradient regressions that per-step smoke tests cannot see."""
    tc = TR.TrainConfig(grad_accum=1, remat=True, mode="all",
                        learning_rate=3e-3, max_train_steps=40,
                        excluded_single_layers=())
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    mask = jax.tree.map(lambda x: jnp.ones(x.shape, jnp.float32), params)
    tx = TR.make_optimizer(tc)
    step = jax.jit(TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla"))
    opt_state = tx.init(params)

    batch = _batch(rng, accum=1)
    key = jax.random.PRNGKey(5)  # FIXED noise/timestep draw -> deterministic target
    losses = []
    for _ in range(40):
        params, opt_state, metrics = step(params, opt_state, mask, vae_params,
                                          batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < 0.5 * losses[0], losses[::8]


def test_qlora_converges_on_fixed_batch(rng):
    """Same learning check through the QLoRA path: LoRA factors over an int8
    weight-only FROZEN base must reduce the loss (gradients flow through the
    dequant-on-read base matmul into the parallel low-rank branch)."""
    from textflux_tpu.io.quantize import quantize_tree

    tc = TR.TrainConfig(grad_accum=1, remat=True, mode="lora", lora_rank=8,
                        lora_alpha=8.0, learning_rate=5e-3, max_train_steps=40,
                        excluded_single_layers=())
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    base = quantize_tree(params, min_size=0, mode="weight_only")
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    lora = TR.lora_init(jax.random.PRNGKey(3), params, FLUX_TINY, tc.lora_rank)
    tx = TR.make_optimizer(tc)
    step = jax.jit(TR.make_lora_train_step(FLUX_TINY, VAE_TINY, tc, tx,
                                           attn_impl="xla"))
    opt_state = tx.init(lora)

    batch = _batch(rng, accum=1)
    key = jax.random.PRNGKey(5)
    losses = []
    for _ in range(40):
        lora, opt_state, metrics = step(base, lora, opt_state, vae_params,
                                        batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < 0.8 * losses[0], losses[::8]


def test_loss_runs_in_bf16_compute(rng):
    """Lock the bf16 autocast: with the default TrainConfig, no transformer
    matmul in the traced loss may run with f32 x f32 operands (the round-3
    regression: f32 batch embeddings promoted the whole joint stream to f32,
    which cost ~7% step time and blew the flash kernel's VMEM envelope at
    8704 tokens). VAE params are cast to bf16 as the real trainer does, so
    any surviving f32 dot_general is a promotion bug."""
    tc = TR.TrainConfig(grad_accum=1)  # default compute_dtype=bfloat16
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_flux_params(jax.random.PRNGKey(0), FLUX_TINY))
    vae_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY))
    batch = jax.tree.map(lambda x: x[0], _batch(rng, accum=1))  # one microbatch

    jaxpr = jax.make_jaxpr(
        lambda p, vp, b, k: TR.flow_matching_loss(
            p, FLUX_TINY, vp, VAE_TINY, tc, b, k, attn_impl="xla")
    )(params, vae_params, batch, jax.random.PRNGKey(2))

    f32_dots = []

    def walk(jp):
        for eqn in jp.eqns:
            if eqn.primitive.name == "dot_general":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                if lhs.dtype == jnp.float32 and rhs.dtype == jnp.float32:
                    f32_dots.append((lhs.shape, rhs.shape))
            for v in eqn.params.values():
                vals = v if isinstance(v, (list, tuple)) else [v]
                for item in vals:
                    if hasattr(item, "jaxpr"):  # ClosedJaxpr (pjit/remat/scan)
                        walk(item.jaxpr)
                    elif hasattr(item, "eqns"):  # raw Jaxpr
                        walk(item)

    walk(jaxpr.jaxpr)
    assert not f32_dots, f"f32 matmuls leaked into the bf16 loss: {f32_dots}"


def test_schedule_shift_flag_plumbs_to_density():
    """--schedule-shift must reach the training sigma warp: with the shift
    matched to the serving schedule (e^mu of the dynamic shift), a
    from-scratch model trains on the sigma trajectory it will be sampled on.
    Round-4 closed-loop failure mode: FLUX's default 3.0 put ~8% of training
    mass below sigma 0.25, leaving the back half of the eval trajectory
    untrained."""
    import math

    from textflux_tpu.cli.train import parse_args
    from textflux_tpu.ops import samplers

    args = parse_args(["--model", "m", "--output-dir", "o",
                       "--schedule-shift", "1.648721"])
    assert args.schedule_shift == pytest.approx(1.648721)

    # matched-shift invariant: train_sigmas with shift=e^mu lands on the same
    # warped schedule make_schedule(dynamic) uses at that token count
    mu = samplers.calculate_shift(256)
    s = math.exp(mu)
    grid = samplers.make_schedule(8, 256)  # dynamic shift at 256 tokens
    u = 1.0 - (np.arange(8, dtype=np.float32) / 8.0 + 0.0005)  # schedule pts
    trained = np.asarray(samplers.train_sigmas(jnp.asarray(u), shift=s))
    expect = s * (1.0 - u) / (1.0 + (s - 1.0) * (1.0 - u))
    assert np.allclose(trained, expect, atol=1e-3)
    # and the dynamic eval grid is exactly the static-s warp of linspace
    lin = np.linspace(1.0, 1.0 / 8, 8)
    assert np.allclose(np.asarray(grid)[:8], s * lin / (1 + (s - 1) * lin),
                       atol=1e-6)


def test_schedule_shift_changes_the_loss(rng):
    """The tc -> loss link: make_train_step must actually consume
    tc.schedule_shift (a hardcoded shift in flow_matching_loss would keep
    the flag-parsing test above green while reverting the round-4 fix).
    Extreme shifts push the sampled sigmas toward opposite ends, so the
    same batch/key must produce measurably different losses."""
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    batch = _batch(rng)
    losses = {}
    for shift in (0.05, 40.0):
        tc = TR.TrainConfig(grad_accum=2, remat=True, learning_rate=1e-3,
                            schedule_shift=shift)
        tx = TR.make_optimizer(tc)
        step = jax.jit(TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx,
                                          attn_impl="xla"))
        _, _, metrics = step(params, tx.init(params),
                             TR.all_trainable_mask(params), vae_params,
                             batch, jax.random.PRNGKey(2))
        losses[shift] = float(metrics["loss"])
    assert np.isfinite(losses[0.05]) and np.isfinite(losses[40.0])
    assert losses[0.05] != pytest.approx(losses[40.0], rel=1e-3), losses




def test_lr_schedule_reference_shapes():
    """cosine_with_restarts / polynomial match the diffusers get_scheduler
    semantics the reference delegates to (parser_helper.py --lr_num_cycles /
    --lr_power)."""
    tc = TR.TrainConfig(lr_scheduler="cosine_with_restarts", learning_rate=2.0,
                        max_train_steps=100, lr_warmup_steps=10, lr_num_cycles=2)
    sched = TR.make_lr_schedule(tc)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(1.0)          # linear warmup
    assert float(sched(10)) == pytest.approx(2.0)         # cycle start
    assert float(sched(55)) == pytest.approx(2.0)         # hard restart at mid
    assert float(sched(32.5)) == pytest.approx(1.0)       # quarter of cycle 1
    assert float(sched(100)) == 0.0                       # end

    tc = TR.TrainConfig(lr_scheduler="polynomial", learning_rate=2.0,
                        max_train_steps=100, lr_warmup_steps=0, lr_power=1.0)
    sched = TR.make_lr_schedule(tc)
    assert float(sched(0)) == pytest.approx(2.0)
    assert float(sched(50)) == pytest.approx(1.0, rel=1e-4)  # power=1 = linear
    assert float(sched(100)) == pytest.approx(1e-7)          # lr_end floor

    tc = TR.TrainConfig(lr_scheduler="polynomial", learning_rate=2.0,
                        max_train_steps=100, lr_warmup_steps=0, lr_power=2.0)
    sched = TR.make_lr_schedule(tc)
    assert float(sched(50)) == pytest.approx(0.5, rel=1e-4)  # (1-p)^2 shape


def test_cond_dropout(rng):
    """--cond-dropout-prob (reference --dropout_prob) perturbs the loss via
    dropout on the packed conditioning; p=0 is the exact default path."""
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    batch = jax.tree.map(lambda x: x[0], _batch(rng, accum=1))
    key = jax.random.PRNGKey(3)

    def loss(p):
        tc = TR.TrainConfig(grad_accum=1, cond_dropout_prob=p)
        return float(TR.flow_matching_loss(params, FLUX_TINY, vae_params,
                                           VAE_TINY, tc, batch, key,
                                           attn_impl="xla"))

    base, base2, dropped = loss(0.0), loss(0.0), loss(0.5)
    assert base == base2                      # deterministic under a fixed key
    assert np.isfinite(dropped)
    assert dropped != base                    # the conditioning actually moved


def test_prodigy_state_safe_to_donate():
    """optax prodigy's init stores p0 by reference; the trainer donates params
    AND opt_state to one jitted step, which aborts on aliased buffers. The
    make_optimizer wrapper must return an unaliased state (found by a real
    --optimizer prodigy CLI crash)."""
    tc = TR.TrainConfig(optimizer="prodigy", learning_rate=1.0)
    tx = TR.make_optimizer(tc)
    p = {"w": jnp.ones((8, 8))}
    st = tx.init(p)
    ptr = p["w"].unsafe_buffer_pointer()
    shared = [l for l in jax.tree.leaves(st)
              if hasattr(l, "unsafe_buffer_pointer")
              and l.shape == p["w"].shape
              and l.unsafe_buffer_pointer() == ptr]
    assert not shared


def test_lora_grouped_reference_family(rng):
    """Fresh LoRA must be the reference peft family: single blocks adapt only
    attn.to_q/k/v (no proj_mlp columns, no proj_out), and fused q/k/v carry
    INDEPENDENT per-module factors (zeroing q's factors leaves k/v deltas
    untouched — a shared-A fused branch couples them)."""
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    lora = TR.lora_init(jax.random.PRNGKey(1), params, FLUX_TINY, 2)
    assert "linear2" not in lora["single"]
    assert lora["double"]["img_qkv"]["a"].shape[1] == 3      # grouped M=3
    lora = jax.tree.map(lambda x: x + 0.1, lora)

    d = FLUX_TINY.hidden_dim
    merged = TR.lora_merge(params, lora, 1.0)
    w0 = np.asarray(params["single"]["linear1"]["w"])
    w1 = np.asarray(merged["single"]["linear1"]["w"])
    np.testing.assert_array_equal(w1[..., 3 * d:], w0[..., 3 * d:])  # mlp tail
    assert np.abs(w1[..., :3 * d] - w0[..., :3 * d]).max() > 0

    lora_q0 = dict(lora, double=dict(lora["double"]))
    f = lora["double"]["img_qkv"]
    lora_q0["double"]["img_qkv"] = {"a": f["a"].at[:, 0].set(0.0),
                                    "b": f["b"].at[:, 0].set(0.0)}
    m_all = np.asarray(TR.lora_merge(params, lora, 1.0)["double"]["img_qkv"]["w"])
    m_q0 = np.asarray(TR.lora_merge(params, lora_q0, 1.0)["double"]["img_qkv"]["w"])
    base = np.asarray(params["double"]["img_qkv"]["w"])
    np.testing.assert_array_equal(m_q0[..., :d], base[..., :d])   # q delta gone
    np.testing.assert_array_equal(m_q0[..., d:], m_all[..., d:])  # k/v intact

    # the parallel-branch application (dense lora_ga) matches the fold
    inserted = TR.lora_insert(params, lora, 1.0)
    x = jnp.asarray(rng.standard_normal((2, FLUX_TINY.hidden_dim)), jnp.float32)
    from textflux_tpu.models.layers import dense

    y_branch = dense(jax.tree.map(lambda v: v[0], inserted["double"]["img_qkv"]), x)
    y_folded = dense(jax.tree.map(lambda v: v[0], merged["double"]["img_qkv"]), x)
    np.testing.assert_allclose(np.asarray(y_branch), np.asarray(y_folded),
                               atol=1e-4)
