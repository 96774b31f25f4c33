"""Scoped-VMEM envelope guard: the measured round-3/4 envelopes as fixtures.

Every pass/fail point below was MEASURED on the v5e (Mosaic scoped-VMEM OOM
at full scan depth vs. compiles-and-runs); the guard's calibration must keep
classifying them correctly. See ops/vmem_budget.py's module docstring for
the provenance of each point.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.ops.vmem_budget import (
    HEADROOM,
    MOSAIC_SCOPED_VMEM,
    bwd_attention_vmem,
    check_fused_attention,
    fused_attention_vmem,
    pick_fused_blocks,
    plain_attention_vmem,
)

FITS = MOSAIC_SCOPED_VMEM


class TestMeasuredChunkedEnvelope:
    """S=8704, kv_chunk=2176 — the four round-4 measured points."""

    def test_serving_auto_fits_fill_scan(self):
        # 1088/544 in fill.py's mods-precomputed scan: ships, runs
        assert fused_attention_vmem(8704, 1088, 544, context="fill_scan") <= FITS

    def test_wide_k_blocks_oom_fill_scan(self):
        # 1088/1088 (chunk 2176): measured OOM by ~1.34 MiB at full depth
        assert fused_attention_vmem(8704, 1088, 1088, context="fill_scan") > FITS

    def test_serving_auto_ooms_raw_mods_scan(self):
        # the parity_spot round-4 failure: auto blocks, mods computed in-body
        assert fused_attention_vmem(8704, 1088, 544, context="raw_mods_scan") > FITS

    def test_halved_q_blocks_fit_raw_mods_scan(self):
        # the fix parity_spot shipped with (pinned by hand until this guard)
        assert fused_attention_vmem(8704, 544, 544, context="raw_mods_scan") <= FITS


class TestMeasuredSinglePassEnvelope:
    def test_serving_sequence_fits(self):
        # S=1696 (the single-line eval config), auto 848/848
        assert fused_attention_vmem(1696, 848, 848, context="fill_scan") <= FITS - HEADROOM

    def test_fused_compile_ceiling_borderline(self):
        # 6144 was the measured whole-KV compile ceiling: must still pass,
        # but near the limit (it WAS the ceiling)
        est = fused_attention_vmem(6144, 1024, 1024, context="fill_scan")
        assert est <= FITS
        assert est > FITS - 4 * HEADROOM

    def test_hoisted_serving_shapes_fit(self):
        # hoist_k engages at kv_chunk <= 4096 and measured -0.7 ms; 1696 and
        # 2560 are the shipped hoisted serving shapes
        assert fused_attention_vmem(1696, 848, 848, context="fill_scan",
                                    hoist_k=True) <= FITS
        assert fused_attention_vmem(2560, 1280, 1280, context="fill_scan",
                                    hoist_k=True) <= FITS

    def test_plain_forward_ceiling(self):
        # plain kernel single-pass <= 12288 (r2 streaming work)
        assert plain_attention_vmem(12288, 1024, 1024) <= FITS

    def test_bwd_ceiling(self):
        # backward single-pass <= 8192 (r2: 16k+ requires chunking)
        assert bwd_attention_vmem(8192, 512, 512) <= FITS

    def test_custom_huge_blocks_rejected(self):
        assert fused_attention_vmem(6144, 3072, 3072, context="none") > FITS


class TestPicker:
    def test_reproduces_serving_auto_under_fill_scan(self):
        assert pick_fused_blocks(8704, context="fill_scan") == (1088, 544)

    def test_reproduces_parity_spot_pin_under_raw_mods(self):
        assert pick_fused_blocks(8704, context="raw_mods_scan") == (544, 544)

    def test_single_pass_exact_fit_unchanged(self):
        assert pick_fused_blocks(1696, context="fill_scan") == (848, 848)

    def test_choice_always_fits_with_headroom(self):
        for s in (1696, 2560, 4608, 8704, 12288, 16384):
            for ctx in ("none", "fill_scan", "raw_mods_scan"):
                bq, bk = pick_fused_blocks(s, context=ctx)
                assert fused_attention_vmem(s, bq, bk, context=ctx) \
                    <= MOSAIC_SCOPED_VMEM - HEADROOM, (s, ctx, bq, bk)


class TestCheckRaises:
    def test_raises_with_working_suggestion(self):
        with pytest.raises(ValueError, match=r"Suggested blocks: \(544, 544\)"):
            check_fused_attention(8704, 1088, 544, context="raw_mods_scan")

    def test_passes_measured_good(self):
        check_fused_attention(8704, 1088, 544, context="fill_scan")
        check_fused_attention(8704, 544, 544, context="raw_mods_scan")

    def test_unknown_context_rejected(self):
        with pytest.raises(ValueError, match="unknown vmem context"):
            fused_attention_vmem(1696, 848, 848, context="fillscan")


class TestKernelIntegration:
    """vmem_context plumbs through flash_attention_qk_norm_rope (CPU
    interpret mode: the guard acts at trace time, before any TPU compile)."""

    def _inputs(self, s, d=128, h=1):
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (1, s, h, d), jnp.float32) * 0.1
                   for i in range(3))
        cos = jnp.ones((s, d), jnp.float32)
        sin = jnp.zeros((s, d), jnp.float32)
        scale = jnp.ones((d,), jnp.float32)
        return q, k, v, cos, sin, scale, scale

    def test_explicit_bad_blocks_raise_at_trace_time(self):
        from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

        args = self._inputs(8704)
        with pytest.raises(ValueError, match="scoped VMEM"):
            flash_attention_qk_norm_rope(*args, block_q=1088, block_k=544,
                                         vmem_context="raw_mods_scan")

    def test_auto_blocks_respect_context_and_match_unguarded_numerics(self):
        from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

        args = self._inputs(640)
        ref = flash_attention_qk_norm_rope(*args)
        out = flash_attention_qk_norm_rope(*args, vmem_context="raw_mods_scan")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
