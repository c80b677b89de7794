"""Test configuration: force CPU backend with 8 virtual devices (the standard
JAX pattern for testing multi-chip sharding without hardware — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A tunneled-TPU PJRT plugin (registered by an interpreter-startup hook) can
# force its own backend to initialize even under JAX_PLATFORMS=cpu, and that
# init BLOCKS when the chip is unreachable — tests must never depend on the
# tunnel.  Drop any non-CPU backend factory BEFORE importing radish_pt_tpu
# (whose import chain runs jnp ops and would trigger the first backend init).
import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

# pop only the tunnel plugin ('axon'): removing jax's own 'tpu' factory
# would also unregister the MLIR 'tpu' lowering platform and break imports
_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="session")
def cornell():
    """Cornell box at tiny resolution; session-cached (compiles are slow on
    the 1-core CI host)."""
    from radish_pt_tpu.scene.build import load_scene

    ds, cam, desc = load_scene(os.path.join(SCENES, "cornell_box.txt"))
    cam = cam.replace(width=16, height=16)
    return ds, cam, desc


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(7)
