"""Batch pipeline: warehouse layout, control-table lifecycle, and the
3-step ETL job runner."""
