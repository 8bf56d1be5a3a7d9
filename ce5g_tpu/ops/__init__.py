"""Pallas TPU kernels for the framework's hot ops.

Each kernel lands only after the lax/XLA reference implementation passes
parity tests (SURVEY §7 step 7); the XLA paths remain as portable
fallbacks and as the ground truth the kernels are tested against.
"""
from .interp_pallas import interpolate_pallas

__all__ = ["interpolate_pallas"]
