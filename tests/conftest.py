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

if not os.environ.get("LCP_TPU_TESTS"):
    # The axon sitecustomize imports jax at interpreter startup and bakes
    # jax_platforms="axon" into the already-imported config, so the env var
    # set above is too late; the config update below is what actually pins
    # the suite to CPU.  Without it, backend init dials the TPU tunnel and
    # hangs indefinitely whenever the relay is down.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

try:
    jax.config.update("jax_default_device", "cpu")
except Exception:
    pass

# NOTE: the persistent compilation cache is intentionally NOT enabled here:
# on this image, writing executables to the cache aborts the process inside
# put_executable_and_time (XLA serialization CHECK), and cache entries
# written by axon-plugin processes SIGILL pure-CPU readers.  Tests pay the
# compile cost per session instead.

# ---------------------------------------------------------------------------
# xdist crash-retry: long-lived workers sporadically abort (SIGABRT/SIGSEGV)
# deep inside XLA CPU compiles — an environment flake, not a test failure
# (every affected test passes in isolation).  --max-worker-restart brings the
# worker back but marks the in-flight test failed; this hook reschedules that
# test (up to twice) on the fresh worker instead, reporting the crash as a
# RERUN rather than a failure.  Runs on the xdist controller only.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Test tiers (reference analog: Makefile:38-46 test matrix).  `-m fast` runs
# the value-level tier (field, ntt, hash, serde, decode, transcript, golden
# oracle, VM) in minutes; `-m slow` runs the compile-heavy end-to-end proves.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_builtin_prove",
    "test_cairo1",
    "test_cairo_prove",
    "test_distributed_ntt",
    "test_domain_sharded",
    "test_examples",
    "test_multiprocess",
    "test_output_program",
    "test_prove_verify",
    "test_prover_errors",
    "test_serde_roundtrip",
    "test_sharded_prove",
    "test_soundness",
    "test_test_transcript",
    "test_trace_attacks",
    "test_trace_file_ingestion",
}
_SLOW_TESTS = {"test_hinted_program_proves", "test_fused_matches_xla_large",
               "test_ecdsa_prove_verify_small_layout",
               "test_keccak_prove_verify", "test_poseidon_prove_verify"}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1] if item.module else ""
        name = item.name.split("[")[0]
        if mod in _SLOW_MODULES or name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


# ---------------------------------------------------------------------------
# Per-test watchdog (fast tier only).  pytest-timeout is not in this image;
# a SIGALRM alarm around each fast-marked test turns a hang into a loud
# failure with a traceback instead of an hour-long stall (round-4 review:
# the tier must complete in minutes and have teeth).  Override with
# LCP_FAST_TEST_TIMEOUT=<seconds>, 0 disables.
# ---------------------------------------------------------------------------

_FAST_TIMEOUT = int(os.environ.get("LCP_FAST_TEST_TIMEOUT", "240"))


def pytest_runtest_call(item):
    import signal

    if _FAST_TIMEOUT <= 0 or item.get_closest_marker("fast") is None:
        item.runtest()
        return
    if not hasattr(signal, "SIGALRM"):  # non-POSIX fallback
        item.runtest()
        return

    def _alarm(signum, frame):
        raise TimeoutError(
            f"fast-tier test exceeded {_FAST_TIMEOUT}s watchdog "
            f"(LCP_FAST_TEST_TIMEOUT)")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_FAST_TIMEOUT)
    try:
        item.runtest()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


_CRASH_RETRIES: dict[str, int] = {}


def pytest_handlecrashitem(crashitem, report, sched):
    n = _CRASH_RETRIES.get(crashitem, 0)
    if n < 2:
        _CRASH_RETRIES[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"


def pytest_report_teststatus(report, config):
    if report.outcome == "rerun":
        return "rerun", "R", ("RERUN", {"yellow": True})
