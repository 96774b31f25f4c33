"""Timing-equivalent zero FLUX param trees, in every serving/training layout.

ONE builder for all benchmarks (bench.py, bench_serving_matrix,
bench_attn_decompose, bench_attn_variants, bench_train_step): the quantized
leaf layout changed twice in round 3 (double-quantized absmax, mixed policy)
and per-file copies of this builder silently benchmarked stale layouts. The
layout here is locked to io.quantize's REAL output by
tests/test_quantize.py::test_zero_params_layout_matches_quantize_tree.

Values are zeros / small scale constants — step timing does not depend on
weight values, and building quantized zeros directly avoids materializing
the 22 GiB bf16 tree that running quantize_tree on real zeros would need.
"""

import jax
import jax.numpy as jnp

from textflux_tpu.io.quantize import MIXED_INT8_NAMES, NF4_BLOCK
from textflux_tpu.models.transformer import init_flux_params


def zero_flux_params(cfg, mode=False, *, min_size: int = 1 << 16,
                     double_quant: bool = False):
    """mode: False (bf16) | True/"weight_only" | "w8a8" | "nf4" | "mixed".
    min_size / mixed policy / nf4 fallback mirror io.quantize.quantize_tree."""
    shapes = jax.eval_shape(lambda k: init_flux_params(k, cfg),
                            jax.random.PRNGKey(0))
    if mode is True:
        mode = "weight_only"

    def build(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict) and "w" in v and v["w"].ndim >= 2 \
                    and mode and v["w"].size >= min_size:
                out[k] = _zero_leaf(v, _leaf_mode(mode, p, v), double_quant)
            elif isinstance(v, dict):
                out[k] = build(v, p)
            else:
                out[k] = jnp.zeros(v.shape,
                                   jnp.bfloat16 if v.ndim >= 2 else v.dtype)
        return out

    return build(shapes)


def _leaf_mode(mode: str, path, v) -> str:
    m = mode
    if mode == "mixed":
        m = ("weight_only" if any(n in path for n in MIXED_INT8_NAMES)
             else "nf4")
    if m == "nf4" and v["w"].shape[-2] % (2 * NF4_BLOCK) != 0:
        m = "weight_only"  # io.quantize._quantize_dense_nf4 falls back too
    return m


def _zero_leaf(v, m: str, double_quant: bool) -> dict:
    *lead, din, dout = v["w"].shape
    if m == "nf4":
        q = {"w_nf4": jnp.zeros((*lead, din // 2, dout), jnp.uint8)}
        if double_quant:
            q["absmax8"] = jnp.zeros((*lead, din // NF4_BLOCK, dout),
                                     jnp.uint8)
            q["amax_lo"] = jnp.full((*lead, dout), 1e-3, jnp.float32)
            q["amax_hi"] = jnp.full((*lead, dout), 2e-2, jnp.float32)
        else:
            q["absmax4"] = jnp.full((*lead, din // NF4_BLOCK, dout), 1e-2,
                                    jnp.float32)
    else:
        key = "w_q8a8" if m == "w8a8" else "w_q"
        q = {key: jnp.zeros((*lead, din, dout), jnp.int8),
             "scale": jnp.full((*lead, dout), 1e-2, jnp.float32)}
    if "b" in v:
        q["b"] = jnp.zeros(v["b"].shape, jnp.bfloat16)
    return q
