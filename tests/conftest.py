"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware.

Note: the container's sitecustomize pre-registers the axon TPU backend and
sets JAX_PLATFORMS=axon, so plain env vars are not enough — we must override
the jax config after import. Tests that need the real TPU should use the
`tpu` marker and run with BWAMEME_TEST_TPU=1.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("BWAMEME_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
