"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU via
``xla_force_host_platform_device_count`` (the reference has no cluster
story to mimic; see SURVEY.md §4). Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU image pre-registers the accelerator backend from sitecustomize
# before env vars can take effect; override via the config API (must happen
# before the first backend use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound on a small-CPU
# host; repeat runs (the common case for the driver and for developers)
# skip most XLA compiles. Best-effort — a cold cache just compiles.
#
# The dir is keyed by a HOST CPU fingerprint: XLA:CPU AOT results encode
# the compile machine's feature set, and this VM migrates between hosts
# with different features across sessions. Deserializing a
# foreign-machine entry ABORTS the process mid-suite (observed:
# cpu_aot_loader "+prefer-no-scatter not supported ... SIGILL" warnings,
# then SIGABRT inside compilation_cache.get_executable_and_time). A new
# host simply gets a fresh cache.


def _host_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nofp"


_cache_dir = os.path.join(os.path.dirname(__file__), "..",
                          f".jax_cache_tests_{_host_fingerprint()}")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_state():
    """Drop compiled-executable caches after every test module.

    A single process running the FULL suite (default + slow tiers)
    accumulates XLA:CPU state until a late 8-device-mesh test dies with a
    fatal signal (the round-2 workaround was a two-process split). The
    persistent compile cache (.jax_cache_tests) makes re-compiles after a
    clear cheap, so bounding live state per module costs little."""
    yield
    jax.clear_caches()


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference repo not mounted; parity oracle unavailable",
)


@pytest.fixture(scope="session")
def ref_src():
    """Import path hook for the reference src/ tree (oracle only)."""
    import sys

    p = os.path.join(REFERENCE_PATH, "src")
    if p not in sys.path:
        sys.path.insert(0, p)
    return p


@pytest.fixture(scope="session")
def small_dataset():
    from mallorn_tpu.data.synthetic import generate_dataset

    return generate_dataset(n_objects=64, seed=123)


@pytest.fixture(scope="session")
def tiny_dataset():
    from mallorn_tpu.data.synthetic import generate_dataset

    return generate_dataset(n_objects=12, seed=7)
