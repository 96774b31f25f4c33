"""On-chip numerics spot-check of the exp2 fused attention kernels at full
FLUX width: flux_apply(attn_impl="fused") vs the XLA reference path at
S=1696 (single-pass envelope) and S=8704 (chunked K/V streaming), random
bf16 weights at reduced depth (2 double + 2 single — every kernel variant
engages; depth does not change per-block numerics under lax.scan).

Run on the target chip: python benchmarks/parity_spot.py
Prints one line per config and exits non-zero if any rel-L2 exceeds the
bf16-rounding budget (3e-2 — the divergence table in ARCHITECTURE.md puts
bf16-vs-fp32 itself at ~0.5% per block; 3% headroom covers the deep-seq
accumulation tail).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.transformer import flux_apply, init_flux_params
from textflux_tpu.ops import packing
from textflux_tpu.ops.rope import rope_tables, rope_tables_half

print("backend:", jax.default_backend())

# With the fused arm fed half-permuted weights (true kernel numerics, no
# convention mismatch) both regimes measure rel_l2 ~2.1e-3 on-chip; 1e-2
# keeps ~5x headroom while catching the ~0.9%-class regressions the old
# 3e-2 budget (set when the mismatch floor ate the margin) would pass.
REL_L2_BUDGET = 1e-2
T_TXT = 512
# (lat_h, lat_w) -> S = lat_h/2 * lat_w/2 + 512; blocks: None = kernel auto.
#   (74, 64)   -> 1696  (512px single-line canvas, single-pass kernels)
#   (256, 128) -> 8704  (2048x1024 multi-line canvas, chunked K/V path)
# The 8704 config runs under the "raw_mods_scan" VMEM context: this harness
# computes AdaLN mods in-body, whose prefetch buffers shrink the kernel's
# scoped-VMEM envelope vs fill.py's mods-precomputed scan (the serving auto
# 1088/544 OOMs here by 1.13M, measured r4). The envelope guard
# (ops/vmem_budget.py) now makes that choice — it reproduces the 544/544
# pin this file used to hard-code. Numerics are block-shape-independent,
# so the parity check is unaffected.
CONFIGS = [((74, 64), "single-pass", None),
           ((256, 128), "chunked", "raw_mods_scan")]

cfg = FluxConfig(num_double_layers=2, num_single_layers=2)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    init_flux_params(jax.random.PRNGKey(0), cfg))
# the fused rotate-half path requires half-permuted qkv columns (exactly
# what FillPipeline applies before attn_impl='fused'); feeding it raw
# interleaved weights compares two RoPE CONVENTIONS, not kernel numerics —
# measured ~0.87% rel-L2 of pure convention mismatch vs ~0.19% true kernel
# error, eating most of the 3e-2 budget
from textflux_tpu.models.transformer import half_permute_flux_params

params_h = half_permute_flux_params(params, cfg)

from textflux_tpu.ops import flash_attention as FA

ORIG_FN = FA.flash_attention_qk_norm_rope

failed = False
for (lat_h, lat_w), label, vmem_ctx in CONFIGS:
    if vmem_ctx is None:
        FA.flash_attention_qk_norm_rope = ORIG_FN
    else:
        def patched(q, k, v, c, s, qs, ks, _ctx=vmem_ctx, **kw):
            kw["vmem_context"] = _ctx
            return ORIG_FN(q, k, v, c, s, qs, ks, **kw)
        FA.flash_attention_qk_norm_rope = patched
    t_img = (lat_h // 2) * (lat_w // 2)
    ids = np.concatenate(
        [packing.text_ids(T_TXT), packing.latent_image_ids(lat_h, lat_w)], 0)
    cos_f, sin_f = (jnp.asarray(a) for a in
                    rope_tables(ids, cfg.axes_dims_rope, cfg.rope_theta))
    cos_h, sin_h = (jnp.asarray(a) for a in
                    rope_tables_half(ids, cfg.axes_dims_rope, cfg.rope_theta))

    k = jax.random.PRNGKey(1)
    img = jax.random.normal(k, (1, t_img, cfg.in_channels), jnp.bfloat16) * 0.5
    txt = jax.random.normal(jax.random.fold_in(k, 1),
                            (1, T_TXT, cfg.joint_dim), jnp.bfloat16) * 0.5
    pooled = jax.random.normal(jax.random.fold_in(k, 2),
                               (1, cfg.pooled_dim), jnp.bfloat16)
    sigma = jnp.full((1,), 0.5, jnp.bfloat16)
    guidance = jnp.full((1,), 30.0, jnp.float32)

    run = jax.jit(lambda p, c, s, impl: flux_apply(
        p, cfg, img, txt, pooled, sigma, guidance, c, s, attn_impl=impl),
        static_argnums=(3,))
    ref = np.asarray(run(params, cos_f, sin_f, "xla"), np.float32)
    out = np.asarray(run(params_h, cos_h, sin_h, "fused"), np.float32)
    rel = float(np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-12))
    ok = rel <= REL_L2_BUDGET
    failed |= not ok
    print(f"parity S={t_img + T_TXT:5d} ({label:11s}): rel_l2={rel:.2e} "
          f"max_abs={float(np.abs(out - ref).max()):.3e} "
          f"{'OK' if ok else 'FAIL'}")

sys.exit(1 if failed else 0)
