"""Host utilities: measures, logging, IO."""
