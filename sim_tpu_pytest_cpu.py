"""Early pytest plugin: force the suite onto a virtual 8-device CPU mesh.

Loaded via ``-p sim_tpu_pytest_cpu`` in pyproject addopts, which happens
BEFORE pytest starts fd-level capture and before any conftest import.  The
image's sitecustomize registers the axon TPU plugin (importing jax!) at
interpreter start whenever PALLAS_AXON_POOL_IPS is set, so scrubbing the
environment after startup is useless — the process must re-exec with a
clean environment for jax to come up on the CPU mesh.

Set SIM_TPU_TESTS_TPU=1 to run against the real attached TPU instead
(needed for the Pallas kernel tests, which skip on CPU).
"""

import os
import sys


def _needs_scrub():
    return (
        "PALLAS_AXON_POOL_IPS" in os.environ
        or os.environ.get("JAX_PLATFORMS") != "cpu"
        or "xla_force_host_platform_device_count"
        not in os.environ.get("XLA_FLAGS", "")
    )


if not os.environ.get("SIM_TPU_TESTS_TPU"):
    if _needs_scrub() and not os.environ.get("_SIM_TPU_TESTS_REEXEC"):
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
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(
            sys.executable,
            [sys.executable, "-m", "pytest"] + sys.argv[1:],
            env,
        )
