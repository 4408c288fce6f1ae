"""Graph compiler: tflite front-end output -> folded IR -> jitted model."""

from .builder import CompiledModel, build, compile_tflite
from .ir import Graph

__all__ = ["CompiledModel", "Graph", "build", "compile_tflite"]
