"""Sources and sinks: file readers, dynamic-destination writers, generator."""
