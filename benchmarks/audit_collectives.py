"""Audit the tensor-parallel serving step's ACTUAL collective schedule from
compiled HLO (no pod needed): compile the per-denoise-step program at full
FLUX width over an 8-device virtual mesh (pure tensor parallelism — the
v5e-8 serving scenario in ARCHITECTURE.md's latency budget) and count every
collective instruction with its payload bytes, per computation (scan bodies
execute once per block: double body x19, single body x38).

Run: python benchmarks/audit_collectives.py  (forces 8 virtual CPU devices)
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = 8
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", N_DEV)

from jax.sharding import NamedSharding, PartitionSpec as P

from textflux_tpu.config import FluxConfig
from textflux_tpu.models import transformer
from textflux_tpu.models.transformer import flux_apply
from textflux_tpu.ops import packing, samplers
from textflux_tpu.ops.rope import rope_tables
from textflux_tpu.parallel import partitioning as PT

HEIGHT, WIDTH, T_TXT = 592, 512, 512
ND, NS = 2, 2          # reduced depth: per-block collective counts are
                       # depth-independent (one scan body per block type)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "s8": 1, "u8": 1, "f16": 2,
               "pred": 1, "u32": 4, "s64": 8, "f64": 8}
COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def split_computations(hlo: str):
    """{computation_name: [instruction lines]} from HLO text."""
    comps, cur, buf = {}, None, []
    head_re = re.compile(r"^(ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\)\s*->.*{")
    for line in hlo.splitlines():
        m = head_re.match(line)
        if m:
            cur = m.group(2)
            buf = []
            comps[cur] = buf
        elif cur is not None:
            buf.append(line)
    return comps


def count_collectives(comps, name_sub: str):
    """{op: (count, payload_bytes)} over computations whose name contains
    name_sub ('' = all)."""
    res_re = re.compile(r"=\s*\(?([a-z0-9]+\[[0-9,]*\])")
    tot = {}
    for name, lines in comps.items():
        if name_sub not in name:
            continue
        for line in lines:
            for op in COLLECTIVES:
                if re.search(rf"\b{op}(-start)?\(", line):
                    m = res_re.search(line)
                    if m:
                        c, b = tot.get(op, (0, 0))
                        tot[op] = (c + 1, b + shape_bytes(m.group(1)))
                    break
    return tot


def find_scan_bodies(hlo: str):
    """The two lax.scan while-loop body computation names (double blocks
    first): matched from `while(...) ... body=%NAME` instructions, ordered
    by appearance (flux_apply scans doubles then singles)."""
    return re.findall(r"while\([^)]*\), condition=%[\w\.\-]+, body=%([\w\.\-]+)", hlo)


def main():
    assert jax.device_count() >= N_DEV
    mesh = PT.make_mesh((1, 1, N_DEV), jax.devices()[:N_DEV])  # pure TP
    cfg = FluxConfig(num_double_layers=ND, num_single_layers=NS)

    shapes = jax.eval_shape(
        lambda k: transformer.init_flux_params(k, cfg), jax.random.PRNGKey(0))
    specs = PT.flux_param_specs(cfg)

    lat_h, lat_w = HEIGHT // 8, WIDTH // 8
    t_img = (lat_h // 2) * (lat_w // 2)
    ids = np.concatenate([packing.text_ids(T_TXT),
                          packing.latent_image_ids(lat_h, lat_w)], 0)
    cos, sin = rope_tables(ids, cfg.axes_dims_rope, cfg.rope_theta)

    # --tp: audit the clean-megatron fast path (device-major weight layout +
    # shard_map'd head-parallel attention). The collective schedule is
    # value-independent, so the audit just passes tp/mesh — the permutation
    # only reorders weight values, never shapes.
    tp_fast = "--tp" in sys.argv

    def step_fn(params, cond, txt, pooled, guidance, cos, sin, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt,
                       pooled, jnp.full((1,), 0.5, jnp.bfloat16), guidance,
                       cos, sin, attn_impl="xla",
                       tp=N_DEV if tp_fast else 1,
                       mesh=mesh if tp_fast else None)
        return samplers.euler_step(lat, v, 0.5, 0.45)

    with mesh:
        pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        rep = NamedSharding(mesh, P())
        lowered = jax.jit(step_fn, in_shardings=(
            pspec, rep, rep, rep, rep, rep, rep, rep)).lower(
            jax.tree.map(lambda sd: jax.ShapeDtypeStruct(sd.shape, jnp.bfloat16
                                                         if sd.ndim >= 2 else sd.dtype),
                         shapes),
            jax.ShapeDtypeStruct((1, t_img, cfg.in_channels - 64), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, T_TXT, cfg.joint_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, cfg.pooled_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct(np.asarray(cos).shape, jnp.float32),
            jax.ShapeDtypeStruct(np.asarray(sin).shape, jnp.float32),
            jax.ShapeDtypeStruct((1, t_img, 64), jnp.bfloat16),
        )
        print("lowered; compiling (SPMD partitioning happens here)...")
        hlo = lowered.compile().as_text()

    comps = split_computations(hlo)
    bodies = find_scan_bodies(hlo)
    dbl_body = bodies[0] if bodies else "\x00"
    sgl_body = bodies[1] if len(bodies) > 1 else "\x00"
    dbl = count_collectives(comps, dbl_body)
    sgl = count_collectives(comps, sgl_body)
    total = count_collectives(comps, "")

    def show(label, tot):
        print(f"  {label}:")
        for op, (c, b) in sorted(tot.items()):
            print(f"    {op:20s} x{c:<3d} {b/2**20:8.2f} MiB")

    print(f"\n== collectives in the compiled TP-{N_DEV} serving step "
          f"(depth {ND}+{NS}, S={T_TXT + t_img}; CPU legalizes bf16->f32, "
          "so TPU payloads are ~1/2 of these) ==")
    show(f"double-block scan body ({dbl_body}) x{ND} trips", dbl)
    show(f"single-block scan body ({sgl_body}) x{NS} trips", sgl)
    db = sum(b for _, b in dbl.values())
    sg = sum(b for _, b in sgl.values())
    ob = sum(b for _, b in total.values()) - db - sg
    print(f"  outside the scan bodies: {ob/2**20:.2f} MiB")

    full = 19 * db + 38 * sg + ob
    print(f"\nfull-depth per-step collective payload: {full/2**20:.0f} MiB f32 "
          f"-> ~{full/2/2**20:.0f} MiB bf16 on TPU")
    # ring all-reduce moves 2(n-1)/n x payload over the slowest link
    ring = 2 * (N_DEV - 1) / N_DEV
    for eff in (180e9, 90e9):
        t = full / 2 * ring / eff
        print(f"implied per-step ICI time at {eff/1e9:.0f} GB/s eff "
              f"(ring factor {ring:.2f}): {t*1e3:.2f} ms")
    ideal = 57 * 2 * (T_TXT + t_img) * 3072 * 2
    print(f"clean megatron schedule (2 bf16 all-reduces/block) would be "
          f"{ideal/2**20:.0f} MiB -> {ideal*ring/180e9*1e3:.1f} ms at 180 GB/s")


if __name__ == "__main__":
    main()
