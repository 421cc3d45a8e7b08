from .bundle import BundleEdits
from .store import Base

__all__ = ["Base", "BundleEdits"]
