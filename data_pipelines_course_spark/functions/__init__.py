"""Scalar/expression helpers shared across operators."""
