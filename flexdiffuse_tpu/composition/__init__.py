"""Composition — regional multi-prompt generation (schema → masked blending)."""
from flexdiffuse_tpu.composition.embeds import encode_schema, px_to_block
from flexdiffuse_tpu.composition.schema import EntitySchema, Schema

__all__ = ['EntitySchema', 'Schema', 'encode_schema', 'px_to_block']
