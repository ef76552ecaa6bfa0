"""Spark operators built on the kernel + training-data pipeline ops."""
