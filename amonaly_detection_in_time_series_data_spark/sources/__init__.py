from .readers import (
    load_csv,
    load_table,
    normalize_columns,
    select_dtypes,
    stamp_arrival_order,
)
from .writers import write_parquet

__all__ = [
    "load_csv",
    "load_table",
    "normalize_columns",
    "select_dtypes",
    "stamp_arrival_order",
    "write_parquet",
]
