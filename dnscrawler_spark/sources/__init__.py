"""Sources & sinks: snapshot-committed table layer (Iceberg semantics
without the Iceberg runtime — SURVEY §7.0)."""
