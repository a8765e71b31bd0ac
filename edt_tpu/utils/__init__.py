"""Utility helpers: dtype/order normalization and a host-side oracle."""
