"""Plan-time (driver-side, schema-level) operators: header mapping, schema checks."""
