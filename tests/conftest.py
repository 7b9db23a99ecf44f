import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.
#
# The environment's sitecustomize registers a remote-TPU ("axon") backend at
# interpreter start and forces jax_platforms="axon,cpu" via jax.config.update,
# so setting the env var alone is not enough — override the config after
# import. XLA_FLAGS is read lazily when the CPU client is first created,
# which has not happened yet at conftest time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# tests use tiny graphs; drop the dense-incidence edge-count floor so the
# dense aggregation paths are exercised (data/graph.py _DENSE_INC_MIN_EDGES)
os.environ.setdefault("IGNNITION_TPU_DENSE_INC_MIN_EDGES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_accumulation():
    """Release compiled XLA executables between test modules.

    The suite compiles hundreds of distinct programs; on small (2-core) CI
    hosts the accumulated XLA CPU state has intermittently crashed the
    process late in the run (fatal 'Aborted' inside backend_compile_and_load
    / segfaults, reproduced twice before this bound). Modules rarely share
    compiled shapes, so the cost is a handful of recompiles."""
    yield
    jax.clear_caches()
