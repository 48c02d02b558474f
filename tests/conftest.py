"""Test harness: run JAX on 8 virtual CPU devices so mesh/collective paths
are exercised hermetically, without the real TPU.

The session's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon already in the env, so jax.config snapshots 'axon' before
this file runs. Backend creation is still lazy, so overriding via
jax.config.update (not just os.environ) before the first device query works.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, jax.devices()
