"""Sources and sinks for the transcript-extraction tables."""
