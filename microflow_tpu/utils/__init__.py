"""Utilities: cost model, cosine similarity, checkpointing, debug dumps."""

from .cache import cached_executable, enable_compile_cache
from .checkpoint import load_params, save_params
from .cosine import cosine_similarity
from .flops import activation_bytes_per_inference, macs_per_inference, weight_bytes

__all__ = [
    "activation_bytes_per_inference",
    "cached_executable",
    "enable_compile_cache",
    "cosine_similarity",
    "load_params",
    "macs_per_inference",
    "save_params",
    "weight_bytes",
]
