"""Scalar/column function libraries (text analysis, vector math)."""
