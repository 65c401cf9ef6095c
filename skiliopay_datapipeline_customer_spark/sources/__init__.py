from .csv import read_csv, write_parquet
from .orc import read_orc, write_orc
from .rest import RateLimiter, fetch_paginated, rest_to_dataframe
from .snapshots import dated_snapshot_path, latest_snapshot_path, write_dated_snapshot
from .jdbc import read_jdbc, write_jdbc

__all__ = [
    "read_csv",
    "write_parquet",
    "read_orc",
    "write_orc",
    "RateLimiter",
    "fetch_paginated",
    "rest_to_dataframe",
    "latest_snapshot_path",
    "dated_snapshot_path",
    "write_dated_snapshot",
    "read_jdbc",
    "write_jdbc",
]
