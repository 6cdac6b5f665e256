"""Test configuration: fake 8-device CPU mesh (the reference's multinode
fake-node pattern, mpi_basic.f90:78-129, adapted to TPU testing: test
multi-chip sharding on host CPU devices)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env default is the axon TPU
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize.py preloads jax before this conftest runs, so the env var
# alone is too late: force the platform through the live config too (the
# backend itself is not initialised until first use, so this still works).
import jax

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge._backends, \
    "a JAX backend initialised before conftest could force CPU"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_mesh():
    """Coarse uniform mesh shared across tests."""
    from ufemism2_tpu.mesh import build_uniform_mesh
    return build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 8e3)


@pytest.fixture(scope="session")
def small_mesh_ops(small_mesh):
    from ufemism2_tpu.mesh.operators import build_all_matrix_operators
    if small_mesh.operators is None:
        small_mesh.operators = build_all_matrix_operators(small_mesh)
    return small_mesh.operators
