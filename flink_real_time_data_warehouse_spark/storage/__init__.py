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
from .txlog_source import TxLogDataSource, register_txlog_source

__all__ = [
    "LogStore",
    "MemoryLogStore",
    "PosixLogStore",
    "TxConflictError",
    "TxLog",
    "TxLogDataSource",
    "TxVersionTruncatedError",
    "register_txlog_source",
]
