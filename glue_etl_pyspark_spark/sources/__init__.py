"""Sources & sinks (SURVEY.md §2.1): format readers/writers and
catalog helpers."""

from .formats import (
    read_avro,
    read_csv,
    read_json,
    read_orc,
    scratch_dir,
    write_avro,
    write_csv,
    write_json,
    write_orc,
    write_partitioned_parquet,
)

__all__ = [
    "read_avro",
    "read_csv",
    "read_json",
    "read_orc",
    "write_avro",
    "write_csv",
    "write_json",
    "write_orc",
    "write_partitioned_parquet",
    "scratch_dir",
]
