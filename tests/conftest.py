"""Test harness: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without a pod (SURVEY.md §4.4).

NOTE: the axon TPU plugin pins jax_platforms at import registration time, so
the override must go through jax.config (env JAX_PLATFORMS is ignored here).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# RTT_TPU_TESTS=1 leaves the real TPU visible so the TPU-only megakernel
# validation tests (test_megakernel_tpu.py) can run:
#   RTT_TPU_TESTS=1 python -m pytest tests/test_megakernel_tpu.py -q
if not os.environ.get("RTT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
