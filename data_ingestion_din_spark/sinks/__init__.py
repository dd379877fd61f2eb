"""Report/file sinks (K-family operators that write artifacts)."""
