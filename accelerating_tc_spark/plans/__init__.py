"""Explicit physical-plan constructors: blocking, workload balance, skew/hub handling."""
