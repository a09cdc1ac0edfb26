"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh (real
multi-chip TPU hardware is not available in CI); single-chip numerics run on
the same platform for determinism.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Some sandboxes preregister a remote TPU PJRT plugin that overrides the
# JAX_PLATFORMS env var; the config update below wins as long as no backend
# has been initialized yet (conftest imports run before any test module).
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: OFF by default. XLA:CPU serializes AOT
# machine code whose embedded target features (+prefer-no-scatter, ...) do
# not match the host feature list, so cache hits load mismatched code —
# cpu_aot_loader warns "could lead to execution errors such as SIGILL" and
# the suite intermittently segfaulted inside compile with the cache on.
# Opt back in with PLVS_TPU_COMPILE_CACHE=1 on machines where it is safe.
if os.environ.get("PLVS_TPU_COMPILE_CACHE"):
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _raise_max_map_count(target: int = 262_144):
    """Every XLA:CPU executable mmaps JIT code regions that are NEVER
    unmapped for the life of the process (jax.clear_caches() does not
    release them), so a long suite run crosses the default
    vm.max_map_count=65530 and LLVM aborts/segfaults INSIDE a later
    compile (Fatal Python error in backend_compile_and_load, exit
    134/139). Raise the limit when the sandbox allows; otherwise warn so
    the crash signature is recognizable."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read())
        if current >= target:
            return
        with open(path, "w") as f:
            f.write(str(target))
    except OSError:
        import warnings

        warnings.warn(
            f"could not raise vm.max_map_count (now {current}); a full "
            "single-process suite run may abort inside XLA compiles once "
            "the process exceeds that many mappings — split the run "
            "(pytest -n 2 --dist loadfile) or raise the sysctl manually.")


_raise_max_map_count()
