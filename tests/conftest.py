import os
import sys

# Run the test suite on a virtual multi-device CPU mesh so sharding logic is
# exercised without TPU hardware (SURVEY.md §4).
#
# The image exports JAX_PLATFORMS=axon globally AND its sitecustomize module
# registers the axon TPU plugin (importing jax in the process!) at
# interpreter start whenever PALLAS_AXON_POOL_IPS is set.  By the time this
# conftest loads, jax is therefore already imported and bound to the TPU —
# mutating os.environ here is too late.  The only reliable fix is to
# re-exec the whole pytest process with a scrubbed environment so
# sitecustomize never registers the plugin.
#
# Set SIM_TPU_TESTS_TPU=1 to run the suite against the real attached TPU
# instead (needed for the Pallas kernel tests, which skip on CPU).
if not os.environ.get("SIM_TPU_TESTS_TPU"):
    _scrub_needed = (
        "PALLAS_AXON_POOL_IPS" in os.environ
        or os.environ.get("JAX_PLATFORMS") != "cpu"
        or "xla_force_host_platform_device_count"
        not in os.environ.get("XLA_FLAGS", "")
    )
    if _scrub_needed and not os.environ.get("_SIM_TPU_TESTS_REEXEC"):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
        env["_SIM_TPU_TESTS_REEXEC"] = "1"
        os.execve(
            sys.executable,
            [sys.executable, "-m", "pytest"] + sys.argv[1:],
            env,
        )
    # Already scrubbed (or nothing to scrub): make sure the flags are set
    # for any child processes tests might spawn.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
