"""Driver-side planning passes applied before DataFrame execution."""

from .prefix_fold import FoldResult, fold_literal_prefix

__all__ = ["FoldResult", "fold_literal_prefix"]
