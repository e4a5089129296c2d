"""Batch transform stages (map_batches bodies and actor-pool classes)."""
