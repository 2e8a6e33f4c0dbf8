"""Source connectors: the parquet scan layer lives in tables.py; this
package holds custom Python data sources (PySpark DataSource API) where a
user resource needs connector-owned lifecycle (SURVEY §2.1 S5)."""
