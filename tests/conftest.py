import os

# Tests run on CPU (8 virtual devices for sharding tests).  NOTE: this
# environment presets JAX_PLATFORMS=axon (a tunneled TPU); env vars alone do
# not override it, so we also set the default device at import time.
# LCP_TPU_TESTS=1 keeps the real TPU visible (for tests/test_tpu_keccak.py
# and other on-hardware regression tests).
if not os.environ.get("LCP_TPU_TESTS"):
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

# NOTE: the persistent compilation cache is intentionally NOT enabled here:
# on this image, writing executables to the cache aborts the process inside
# put_executable_and_time (XLA serialization CHECK), and cache entries
# written by axon-plugin processes SIGILL pure-CPU readers.  Tests pay the
# compile cost per session instead.
