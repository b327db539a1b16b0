"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require a real TPU; every jitted program in the framework is
backend-agnostic, and multi-chip sharding is validated on a virtual CPU mesh
(SURVEY.md section 4: "CPU-backend jax runs of every jitted program so tests
need no TPU").

This must run before jax is imported anywhere.
"""
import os

# Hard override: the surrounding environment may pin JAX_PLATFORMS to a TPU
# plugin; tests must run on the local CPU backend with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The TPU plugin's sitecustomize can force its own platform regardless of the
# env var; re-assert CPU through the config API before any device is touched.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _evict_compiled_programs_between_modules():
    """Bound per-process executable accumulation.

    A full single-process suite run compiles many hundreds of XLA CPU
    executables; past ~90% of the suite the NEXT large compile can segfault
    inside the CPU JIT (observed twice, deterministically at the same test,
    while every standalone/half-suite run passes). Clearing jit caches at
    module boundaries keeps within-module program reuse but releases the
    accumulated executables. Costs a few re-traces per module boundary.
    """
    yield
    import jax

    jax.clear_caches()
