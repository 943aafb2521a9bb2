"""Sources/sinks: thin, pruning-aware wrappers over ray.data readers."""

from .io import read_ndjson, read_transcripts, write_ndjson

__all__ = ["read_transcripts", "read_ndjson", "write_ndjson"]
