"""Flash-attention backward crossover on one TPU chip: XLA-recompute VJP vs
the pallas dq/dk/dv kernels over sequence length (sets
ops/attention.PALLAS_BWD_MIN_SEQ; table in ARCHITECTURE.md).

Run on the target chip: python benchmarks/bench_bwd_crossover.py
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from textflux_tpu.ops.attention import _xla_attention
from textflux_tpu.ops.flash_attention import flash_attention, flash_attention_bwd
from textflux_tpu.utils.benchmarking import time_step

print("backend:", jax.default_backend())
H, D = 24, 128
rng = np.random.default_rng(0)

def bench_seq(S):
    k = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.bfloat16)

    def xla_grad(q, k, v, do):
        _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v), q, k, v)
        dq, dk, dv = vjp(do)
        return (0.5 * q + 0.5 * dq).astype(q.dtype)

    def pallas_grad(q, k, v, do):
        dq, dk, dv = flash_attention_bwd(q, k, v, do)
        return (0.5 * q + 0.5 * dq).astype(q.dtype)

    q0 = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.bfloat16)
    jx = jax.jit(xla_grad); jp = jax.jit(pallas_grad)
    out = {}
    for name, fn in [("xla_recompute_bwd", jx), ("pallas_bwd", jp)]:
        try:
            t = time_step(lambda q: fn(q, k, v, do), q0, iters_hi=8, iters_lo=2, repeats=2)
            out[name] = t
        except Exception as e:
            out[name] = f"FAILED {type(e).__name__}: {str(e)[:120]}"
    return out

for S in (1024, 1536, 1696, 2048, 4096, 8192, 16384):
    r = bench_seq(S)
    def fmt(v):
        return f"{v*1000:8.2f} ms" if isinstance(v, float) else str(v)
    print(f"S={S:6d}: xla={fmt(r['xla_recompute_bwd'])}  pallas={fmt(r['pallas_bwd'])}")
