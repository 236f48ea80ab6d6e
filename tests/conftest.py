"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(`shard_map` over a `jax.sharding.Mesh`) is exercised without TPU pod
hardware (the standard JAX testing recipe), and with float64 enabled so
golden tests can bit-match the float64 NumPy reference.

These environment knobs must be set before `jax` is imported anywhere.
"""

import os

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS pointing at
# the TPU tunnel, so env edits alone are too late; backends initialize lazily,
# so jax.config still wins as long as no array op ran yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE_ROOT = Path("/root/reference")

sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def reference_modules():
    """Import the upstream NumPy reference as a test oracle (if mounted)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted at /root/reference")
    sys.path.insert(0, str(REFERENCE_ROOT))
    import ray_tracer.application as app  # noqa: F401
    import ray_tracer.infrastructure.numpy.base as base
    import ray_tracer.infrastructure.numpy.shader as shader
    import ray_tracer.infrastructure.numpy.shape as shape
    from ray_tracer import domain

    return dict(base=base, shape=shape, shader=shader, domain=domain)


@pytest.fixture(scope="session")
def reference_render_png():
    path = REFERENCE_ROOT / "render.png"
    if not path.exists():
        pytest.skip("reference render.png not available")
    from python_ray_tracer_tpu.utils.image import load_png

    return load_png(path)
