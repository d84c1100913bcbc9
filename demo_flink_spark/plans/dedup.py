"""Placeholder plan module — filled in as operators land."""

SPECS: list = []
