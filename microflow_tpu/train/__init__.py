"""On-device integer training (fork parity: gradients, optimizer, losses)."""

from . import gradients, losses, optimizer
from .trainer import TrainableModel, compile_tflite_train

__all__ = ["TrainableModel", "compile_tflite_train", "gradients", "losses", "optimizer"]
