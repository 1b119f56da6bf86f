"""Sources: parquet catalog + JDBC."""
from .base import Source
from .parquet import ParquetDirSource
from .jdbc import JDBCSource
