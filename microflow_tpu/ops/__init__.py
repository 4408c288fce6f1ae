"""Quantized operator kernels (pure-JAX exact backend).

Each op replicates the reference integer/float math bit-for-bit; the
Pallas backend in ``microflow_tpu.kernels`` provides fused TPU kernels
with identical numerics.
"""

from .average_pool_2d import average_pool_2d
from .conv_2d import conv_2d
from .depthwise_conv_2d import depthwise_conv_2d
from .fully_connected import fully_connected
from .reshape import reshape
from .softmax import softmax

__all__ = [
    "average_pool_2d",
    "conv_2d",
    "depthwise_conv_2d",
    "fully_connected",
    "reshape",
    "softmax",
]
