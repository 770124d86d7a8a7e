"""Test bootstrap: force an 8-virtual-device CPU platform so sharding paths
(mesh, shard_map collectives) run hermetically without TPU hardware."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers an 'axon' TPU backend and pins
# jax_platforms='axon,cpu' via jax.config, which wins over the env var —
# re-pin to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from facerecognition_infrenceengine_tpu.parallel import build_mesh

    return build_mesh(jax.devices(), data=2, gallery=4)
