"""Event-time streaming operators (Structured Streaming) and their
batch-equivalent query surface."""
