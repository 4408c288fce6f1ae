"""Kernel-backend configuration knobs."""

import jax

# Run Pallas kernels in interpreter mode (for CPU testing).  Defaults to
# True automatically when no TPU is present so the pallas backend works
# everywhere.
INTERPRET: bool | None = None


def interpret() -> bool:
    global INTERPRET
    if INTERPRET is None:
        INTERPRET = jax.default_backend() not in ("tpu", "axon")
    return INTERPRET
