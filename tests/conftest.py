"""Test harness config: force CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and run without TPU hardware."""
import os
import sys

# Force CPU even when the session env points JAX at a TPU plugin
# (JAX_PLATFORMS=axon): unit tests must be hermetic and host-runnable.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo importable when pytest is run from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the trial-grid kernels are expensive to
# compile on CPU; cache across test runs.
import jax  # noqa: E402

# The axon TPU plugin's sitecustomize re-points JAX_PLATFORMS at import
# time; the config knob wins over plugin registration.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
