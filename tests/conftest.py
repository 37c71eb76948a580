"""Test environment: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the driver separately dry-runs the multi-chip path the same way).

Note: this machine's sitecustomize registers an 'axon' TPU PJRT plugin at
interpreter start and programmatically sets jax_platforms, so the env var
alone is not enough — we must override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NSTPU_TEST_REAL_CHIP=1 keeps the attached accelerator visible so the
# compiled-kernel smoke tests (test_tpu_compiled.py) exercise the real
# Mosaic path; default is the virtual CPU mesh for hermetic CI.
if os.environ.get("NSTPU_TEST_REAL_CHIP") != "1":
    jax.config.update("jax_platforms", "cpu")
    # jax >= 0.9 ignores --xla_force_host_platform_device_count; the
    # supported route is the jax_num_cpu_devices config, which must land
    # before the first backend initialization (this file imports before
    # any test touches a device)
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older jax without the option: XLA_FLAGS above covers it
