"""Test configuration: force an 8-device virtual CPU mesh BEFORE any backend init.

Mirrors the multi-chip test strategy from SURVEY.md §4: sharded paths are
validated on a host-platform device mesh; the real TPU chip is only exercised by
bench.py / the driver. The harness environment pins JAX_PLATFORMS=axon, so the
env var alone is not enough — jax.config.update must override it.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/kzg_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gc
import random

import pytest

# JAX tracing is pure Python and allocates heavily; in a long test process the
# accumulated live heap makes every gen-2 GC scan (triggered constantly during
# tracing) cost seconds. Freeze the post-import heap out of collection and
# raise the gen-0 threshold — tests create no reference cycles worth chasing.
gc.freeze()
gc.set_threshold(50000, 50, 50)


@pytest.fixture
def rng():
    return random.Random(0xB152381)
