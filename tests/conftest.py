"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) as the driver does; compute
tests run on CPU for speed (TPU compile latency dominates small tests).
Must run before jax initializes its backends.
"""

import os

# Set PSVI_TPU_TESTS=1 to run the suite on the real TPU (pallas tests etc.);
# default forces the fast 8-device virtual CPU mesh.
_use_tpu = os.environ.get("PSVI_TPU_TESTS") == "1"
if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU for fast unit tests
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _use_tpu:
    # The axon sitecustomize force-registers jax_platforms="axon,cpu" at
    # interpreter start; flip back to CPU before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _reference_available():
    try:
        import torch  # noqa: F401

        return os.path.isdir("/root/reference/psvi")
    except Exception:
        return False


reference_available = _reference_available()


def stub_reference_deps():
    """Install dummy modules for reference deps absent from this image
    (torchvision, arff, requests, faiss) so `import psvi...` works as a
    numerical oracle. The stubbed functionality is never exercised by the
    oracle tests."""
    import sys
    import types

    for name in [
        "torchvision",
        "torchvision.transforms",
        "torchvision.datasets",
        "arff",
        "requests",
        "faiss",
    ]:
        if name not in sys.modules:
            try:
                __import__(name)
            except Exception:
                mod = types.ModuleType(name)
                sys.modules[name] = mod
                if "." in name:
                    parent, child = name.rsplit(".", 1)
                    setattr(sys.modules[parent], child, mod)
    # minimal attrs the reference touches at import time
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        tv.transforms = sys.modules.get("torchvision.transforms")
