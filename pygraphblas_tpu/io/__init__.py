"""I/O: MatrixMarket, TSV/CSV, and binary checkpoint formats."""
