"""Operator library: reference-parity transforms + large-scale extensions."""
