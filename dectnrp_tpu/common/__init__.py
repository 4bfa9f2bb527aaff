"""Common infrastructure (reference lib/*/common/): clocks, logging,
batched JSON export, ADTs and the live-IQ TCP scope.
"""
from .json_export import JsonExport
from .watch import Watch

__all__ = ["JsonExport", "Watch"]
