"""Sources: testdata parquet scans, HTTP extraction, bronze data lake,
and the pluggable source registry."""
