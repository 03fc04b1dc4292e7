"""Custom data sources (Python Data Source API, PySpark >= 4.0)."""
