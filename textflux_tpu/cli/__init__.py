"""CLI entry points (run_inference / run_eval / train / demo / eval_*).

Importing this package pins the JAX platform to the JAX_PLATFORMS env var
when one is set: the axon TPU plugin's site hook initializes its backend on
first `jax.devices()` regardless of the env var, so a `JAX_PLATFORMS=cpu`
CLI run would still open (and, if the tunnel is wedged, hang on) the TPU
client without this. `jax.config.update` is the documented override the
hook respects (see tests/conftest.py and CLAUDE.md).
"""

import os


def _pin_platform_from_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "," not in plat:
        import jax

        jax.config.update("jax_platforms", plat)


_pin_platform_from_env()
