"""Persistence: checkpoint serialization and block-based storage."""
from vss_tpu.storage.serialize import (
    deserialize_index,
    load_index,
    save_index,
    serialize_index,
    view_index,
)

__all__ = [
    "serialize_index",
    "deserialize_index",
    "save_index",
    "load_index",
    "view_index",
]
