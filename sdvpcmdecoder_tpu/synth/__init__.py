"""Synthetic encoders (inverse pipeline) for conformance testing."""
