"""Pallas TPU kernels (fused, bit-exact with the pure-JAX ops).

Set ``microflow_tpu.kernels.config.INTERPRET = True`` (done by the test
conftest on CPU) to run every kernel in the Pallas interpreter.
"""

from . import config
from .qdwconv import qdwconv
from .qgemm import qgemm

__all__ = ["config", "qdwconv", "qgemm"]
