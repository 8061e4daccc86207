"""Source scans (SURVEY.md §2.1).

The reference fetches 5 HTTP/JSON APIs driver-side with ``requests`` and
normalizes each payload shape with pandas (reference raw_data.py:22-206).
Here the *fetch* is an injectable callable (no network dependency; at scale
payloads are landed to storage and read with ``spark.read.json``) and each
*normalization* is a payload→DataFrame function whose transformations are
Spark-native: ``from_json``/struct access for nested records, ``explode`` +
pivot for the generation mix, column functions for the URL/string parsing.
"""

from big_data_project_datapipeline_spark.sources.json_payloads import (
    normalize_parallel_arrays,
    normalize_carbon_records,
    normalize_generation_mix,
    normalize_prices,
)

__all__ = [
    "normalize_parallel_arrays",
    "normalize_carbon_records",
    "normalize_generation_mix",
    "normalize_prices",
]
