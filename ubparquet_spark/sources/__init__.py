"""Custom Spark data sources (Python Data Source API)."""
