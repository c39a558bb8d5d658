from ahnlich_spark.sources.snapshot import export_snapshot, import_snapshot
from ahnlich_spark.sources.store_io import read_store, write_store
from ahnlich_spark.sources.testdata import load_table, load_tables, TABLES

__all__ = [
    "read_store", "write_store", "load_table", "load_tables", "TABLES",
    "import_snapshot", "export_snapshot",
]
