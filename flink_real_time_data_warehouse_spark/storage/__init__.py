"""Storage-layer primitives: the multi-writer transaction log."""

from .txlog import TxConflictError, TxLog

__all__ = ["TxConflictError", "TxLog"]
