import os

# Tests run on CPU (8 virtual devices for sharding tests).  NOTE: this
# environment presets JAX_PLATFORMS=axon (a tunneled TPU); env vars alone do
# not override it, so we also set the default device at import time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", "cpu")
except Exception:
    pass

# Persistent compilation cache: the limb-arithmetic graphs are large and
# recompiling them per test session dominates runtime otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
