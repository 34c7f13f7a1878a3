from fluss_datafusion_spark.catalog.metadata import ColumnSpec, TableSpec
from fluss_datafusion_spark.catalog.catalog import FlussCatalog

__all__ = ["ColumnSpec", "TableSpec", "FlussCatalog"]
