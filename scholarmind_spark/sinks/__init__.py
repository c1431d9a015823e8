from scholarmind_spark.sinks.excel import SHEET_SPECS, write_excel, write_sheets_csv
from scholarmind_spark.sinks.parquet import flatten_for_presentation, write_parquet

__all__ = [
    "SHEET_SPECS",
    "flatten_for_presentation",
    "write_excel",
    "write_parquet",
    "write_sheets_csv",
]
