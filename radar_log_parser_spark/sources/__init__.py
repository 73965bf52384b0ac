"""Sources/sinks: fixture generation and checkpoint-table IO."""
