"""Structured Streaming surface: event-time windowed aggregation with
watermarks, batch-replay parity harness, and stateful sessionization."""
