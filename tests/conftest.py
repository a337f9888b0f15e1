"""Test harness: force an 8-device virtual CPU backend BEFORE jax imports,
so sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4d)."""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS to a TPU tunnel,
# which makes unit tests compile remotely (minutes per test).  Set
# DVC_TPU_TEST_PLATFORM to override (e.g. to run the suite on real TPU).
os.environ["JAX_PLATFORMS"] = os.environ.get("DVC_TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: this image pre-imports jax from sitecustomize (TPU tunnel), so env
# vars alone are too late — force the platform via config as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: repeat test runs skip XLA compilation entirely
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:  # bounded cache: evict LRU entries past 4 GB
    from dvc_tpu.utils.cache import prune_compile_cache
    prune_compile_cache(os.path.abspath(_cache_dir))
except Exception:
    pass

# keep CPU compile times sane: no LSTM scan unrolling in tests
from dvc_tpu.models import layers as _layers  # noqa: E402

_layers.DEFAULT_UNROLL = 1
_layers.FULL_UNROLL_MAX_T = 0

# Crash guard (VERDICT r4 weak-item 5): one unreproduced interpreter abort
# occurred mid-suite with torch + jax both loaded.  Enable faulthandler with
# a periodic traceback dump so any recurrence names the running test, and
# stamp the current test id into the environment for post-mortem reads.
import faulthandler  # noqa: E402
import sys  # noqa: E402

faulthandler.enable(file=sys.stderr, all_threads=True)


def pytest_runtest_setup(item):
    os.environ["DVC_CURRENT_TEST"] = item.nodeid
    # dump all thread stacks if any single test wedges for > 10 minutes
    faulthandler.dump_traceback_later(600, repeat=False, file=sys.stderr)


def pytest_runtest_teardown(item):
    faulthandler.cancel_dump_traceback_later()
