"""Sources and sinks: testdata tables, transcript derivation, checkpointing."""
