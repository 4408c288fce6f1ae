"""Test harness: force the CPU platform with a virtual 8-device mesh so
sharding tests run without TPU hardware.  Must run before jax is imported
anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# pin the suite to the XLA backend: the production default ("auto")
# builds the flat Pallas kernel on TPU, whose Mosaic compile takes
# minutes per model; flat-specific tests opt in explicitly
os.environ.setdefault("MFT_BACKEND", "xla")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
