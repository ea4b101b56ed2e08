"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (multi-chip paths are validated on a virtual mesh).

The environment pins JAX_PLATFORMS=axon (tunneled TPU) and the axon plugin
re-asserts itself over the env var, so we also force the platform through
jax.config after import. Set SM_TEST_TPU=1 to run the suite on the real
chip instead (sharding tests skip if <8 devices).
"""

import os

if not os.environ.get("SM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
