"""CLI command modules (reference: src/helicon/commands/)."""
