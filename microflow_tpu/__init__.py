"""microflow_tpu: a TPU-native INT8 inference + integer-training engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the MicroFlow
Rust TinyML engine (Geostartico/microflow-rs): a tflite flatbuffer
compiler front-end emits a static, shape-monomorphic JAX graph whose
quantized kernels run on the MXU/VPU, batched and shardable across a TPU
mesh -- where the reference runs one sample at a time on an MCU core.
"""

from .compiler import CompiledModel, build, compile_tflite
from .frontend import parse
from .train.trainer import TrainableModel, compile_tflite_train

__version__ = "0.1.0"

__all__ = ["CompiledModel", "TrainableModel", "build", "compile_tflite",
           "compile_tflite_train", "parse"]
