"""HTTP application layer — the reference's ``bulkerapp`` surface."""

from .router import BulkerApp, Destination, serve

__all__ = ["BulkerApp", "Destination", "serve"]
