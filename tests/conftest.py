import os

# Run the test suite on a virtual multi-device CPU mesh so sharding logic is
# exercised without TPU hardware (SURVEY.md §4).
#
# The image exports JAX_PLATFORMS=axon globally AND its sitecustomize module
# registers the axon TPU plugin in every python process whenever
# PALLAS_AXON_POOL_IPS is set — merely setting JAX_PLATFORMS=cpu is not
# enough to dislodge it.  Pop the pool variable (before any jax import; this
# conftest loads first) so the suite genuinely runs on the 8-device CPU mesh.
#
# Set SIM_TPU_TESTS_TPU=1 to run the suite against the real attached TPU
# instead (needed for the Pallas kernel tests, which skip on CPU).
if not os.environ.get("SIM_TPU_TESTS_TPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
