"""Text: pure-Python CLIP BPE tokenizer."""
from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer, FakeTokenizer

__all__ = ["CLIPTokenizer", "FakeTokenizer"]
