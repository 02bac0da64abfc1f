"""External-source connectors beyond the built-in file formats."""
