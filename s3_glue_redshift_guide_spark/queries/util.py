"""Re-export of the engine numeric conventions (functions/numeric.py) for
query modules; kept separate so non-query code (streaming) never imports
the queries package (avoids a registry-import cycle)."""

from ..functions.numeric import MONEY, dsum, money

__all__ = ["MONEY", "money", "dsum"]
