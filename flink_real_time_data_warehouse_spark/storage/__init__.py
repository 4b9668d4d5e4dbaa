"""Storage-layer primitives: the multi-writer transaction log and its
pluggable manifest-store profiles."""

from .txlog import (
    LogStore,
    MemoryLogStore,
    PosixLogStore,
    TxConflictError,
    TxLog,
    TxVersionTruncatedError,
)

__all__ = [
    "LogStore",
    "MemoryLogStore",
    "PosixLogStore",
    "TxConflictError",
    "TxLog",
    "TxVersionTruncatedError",
]
