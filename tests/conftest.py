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

# Persistent XLA compilation cache: compile time dominates this suite (tiny
# models, one CPU core), and many tests build identical jitted programs
# (same tiny configs via fresh make_train_step closures), which recompile
# from scratch without it. Verified working on the CPU backend (jax 0.9.0);
# entries are keyed by HLO fingerprint so correctness is unaffected. The
# dir lives under /tmp: best case (rerun within a container) the suite gets
# large cache hits, worst case it behaves exactly as before.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_COMPILE_CACHE",
                                 "/tmp/mae_clip_tpu_test_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, jax.devices()
