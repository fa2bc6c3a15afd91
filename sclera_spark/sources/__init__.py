"""Virtual / external table sources (reference: modules/core pgcatalog/,
external/)."""
