"""Shared utilities: byte-level (de)serialization, config."""

from .serde import ByteReader, ByteWriter

__all__ = ["ByteReader", "ByteWriter"]
