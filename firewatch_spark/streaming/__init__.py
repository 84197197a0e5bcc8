"""Structured Streaming spine: stateful session operator + pipeline wiring."""
