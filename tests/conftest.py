import os

# Run the test suite on a virtual multi-device CPU mesh so sharding logic is
# exercised without TPU hardware (SURVEY.md §4).  Force-override: the image
# exports JAX_PLATFORMS=axon globally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
