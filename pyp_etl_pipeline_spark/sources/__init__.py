"""Sources & sinks (S1-S12)."""
