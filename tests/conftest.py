"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax initializes a backend, hence env vars set here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU plugin in this image rewrites jax_platforms to "axon,cpu" at
# import, overriding the env var; force it back so tests stay on CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_inp():
    if not REFERENCE.exists():
        pytest.skip("reference data not available")
    return REFERENCE / "inp"


@pytest.fixture(scope="session")
def ref_transitions():
    if not REFERENCE.exists():
        pytest.skip("reference data not available")
    return REFERENCE / "transitions"


@pytest.fixture(scope="session")
def network(ref_inp):
    from rac2d_tpu.io import umist
    return umist.load_network(
        str(ref_inp / "rate06_withgrain_lowH2Bind_hiOBind_lowCObind.dat"),
        enthalpy_path=str(ref_inp / "Species_enthalpy.dat"))
