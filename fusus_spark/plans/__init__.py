"""Query plans exposed through the driver contract (__spark_entry__)."""
