"""Scalar/vector function families and engine-wide numeric conventions.

numeric — exact-decimal money arithmetic (cross-engine determinism)
vectors — array<float> similarity primitives (dot, norm, cosine)
text    — tokenization, language id, quality scoring, fingerprints
"""

from .numeric import MONEY, dsum, money

__all__ = ["MONEY", "money", "dsum"]
