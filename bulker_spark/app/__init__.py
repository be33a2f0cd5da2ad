"""HTTP application layer — the reference's ``bulkerapp`` surface."""

from .cron import BatchRunner
from .router import BulkerApp, Destination, serve

__all__ = ["BatchRunner", "BulkerApp", "Destination", "serve"]
