"""Weights: HF checkpoint conversion and cached loading."""
from flexdiffuse_tpu.weights import convert, load, lora

__all__ = ["convert", "load", "lora"]
