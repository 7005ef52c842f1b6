"""Ingest surface: REST/JSON/CSV sources, typed schemas, partitioned sinks."""
