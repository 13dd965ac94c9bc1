"""Test configuration: force CPU JAX with a virtual 8-device mesh so sharding
tests run without TPU hardware (and without occupying the real chip).

The environment ships JAX_PLATFORMS=axon (the TPU tunnel) and the axon
plugin overrides the env var at import, so the platform must be forced via
jax.config before any backend is initialized. Opt back into the real chip
with BIRDA_TEST_TPU=1.
"""
import os

# The providers command probes the accelerator in a bounded subprocess;
# tests must not sit out the full default timeout dialing the tunnel.
os.environ.setdefault("BIRDA_PROVIDER_PROBE_TIMEOUT", "0.5")

if not os.environ.get("BIRDA_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
