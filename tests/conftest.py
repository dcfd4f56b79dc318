"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware, and keep x64 on for u64 field arithmetic."""

import os

# Must be set before jax import (any test importing the package imports jax).
# The harness presets JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize that
# re-forces it via jax.config; tests run on a virtual CPU mesh instead —
# override both the env var and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persist CPU-compiled executables across suite runs — the e2e prove tests
# are compile-dominated on the virtual mesh
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CODE = "/root/reference/code"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_CODE)


def add_reference_to_path():
    """Make the reference implementation importable as a test oracle.

    Import-only: nothing is copied; the reference runs as the 'golden model'
    for cross-implementation checks."""
    if REFERENCE_CODE not in sys.path:
        sys.path.insert(0, REFERENCE_CODE)
    # the reference dir is read-only; don't try to write .pyc files there
    sys.dont_write_bytecode = True


# Pre-import the real reference modules (when mounted) so the interop shims
# never shadow them within a test session — the RefCodec prefers whatever
# `algebra` et al. resolve to, and mixing shims with the real modules in one
# process would break the reference-oracle tests.
if reference_available():
    add_reference_to_path()
    try:
        import algebra  # noqa: F401
        import extension_field  # noqa: F401
        import univariate  # noqa: F401
    except ImportError:
        pass
