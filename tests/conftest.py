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

# Tests measured >5 s on the 8-device virtual CPU mesh (dominated by XLA
# compile time). Deselected by default via pytest.ini addopts; run with
# -m "slow or not slow" for the full suite. Bare names mark every
# parametrization; bracketed names mark a single parametrization.
SLOW_TESTS = {
    "test_bf16_nested_step_finite_and_close",
    "test_resnet18_forward",
    "test_profile_dir_writes_trace",
    "test_alexnet_forward",
    "test_lenet_forward_shapes",
    "test_dryrun_multichip_entry",
    "test_checkpoint_roundtrip",
    "test_mfvi_regressor_model_selection",
    "test_fc2net_full_covariance",
    "test_increment",
    "test_gradients_flow_to_hyperparams",
    "test_scoring_run_writes_csvs",
    "test_trial_parallel_matches_vmap_no_mesh",
    "test_trial_parallel_chained_matches_unchained",
    "test_mc_sharded_step_matches_replicated",
    "test_pallas_backend_engine_matches_xla",
    "test_bf16_forward_close_to_f32",
    "test_set_up_model_dispatch[fn2-kw3]",
    "test_unbatched_input_paths_match_broadcast",
    "test_packed_kl_nkl_close",
    "test_batch_sharded_step_matches_replicated",
    "test_fcnet_forward_and_nkl_shapes",
    "test_argmax_pool_matches_reshape_pool",
    "test_conv_forward_kl_nkl_match_reference",
    "test_results_roundtrip_and_retrieve",
    "test_inner_unroll_same_numerics",
    "test_bnn_fn_architecture",
    "test_run_giga",
    "test_prune",
    "test_reset_and_retrain",
    "test_trial_parallel_runs",
    "test_run_mfvi",
    "test_bf16_kl_nkl_stay_f32_exact",
    "test_pred_on_grid",
    "test_method_variants_run[psvi_no_iw]",
    "test_fullcov_forward_kl_nkl_match_reference",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.name in SLOW_TESTS or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


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
