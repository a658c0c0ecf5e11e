"""spark-submit entry points (cluster launch surface)."""
