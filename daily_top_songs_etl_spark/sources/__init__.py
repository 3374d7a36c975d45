"""Sources & sinks: seed CSV bootstrap, HTTP ingest shim, CSV mirrors."""

from .csv_seed import bootstrap, read_seed_csv
from .sinks import csv_mirror_lines, write_csv_mirror

__all__ = ["bootstrap", "read_seed_csv", "csv_mirror_lines", "write_csv_mirror"]
