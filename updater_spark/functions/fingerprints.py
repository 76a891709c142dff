"""Row fingerprint expressions.

The reference fingerprints each row server-side as
``CRC32(CONCAT_WS('', col1, col2, ...))`` over the *data* columns, PK
included, computed scores excluded (/root/reference/src/download.py:133,
download.py:392; column classification table.py:80-91).

Parity notes (SURVEY.md §4 "hash fidelity"):
- MySQL ``CONCAT_WS`` skips NULL arguments; Spark ``concat_ws`` does
  the same.
- MySQL stringifies integers identically to Spark's ``cast(string)``;
  only raw int/string columns enter the hash in the reference (floats
  are never in the data set), so renderings agree byte-for-byte.
- Spark ``crc32`` over the UTF-8 bytes equals MySQL ``CRC32`` equals
  ``zlib.crc32`` (tested in tests/test_fingerprint.py).

``algo='md5'`` is the DuckDB-oracle-friendly variant (DuckDB has no
crc32); semantics are identical, only the hash function differs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_fingerprint(columns: list[str], algo: str = "crc32") -> Column:
    """Fingerprint expression over ``columns`` in the given order."""
    rendered = F.concat_ws("", *[F.col(c).cast("string") for c in columns])
    if algo == "crc32":
        return F.crc32(rendered.cast("binary"))
    if algo == "md5":
        return F.md5(rendered.cast("binary"))
    if algo == "xxhash64":
        # Not a MySQL function — offered as the cheaper 64-bit option
        # for 100 TB scale (collision odds of 32-bit CRC over 1e11 rows
        # are a real concern; xxhash64 stays JVM-codegen'd).
        return F.xxhash64(rendered)
    raise ValueError(f"unknown fingerprint algo: {algo}")


def fingerprint_table(df, key: str, data_columns: list[str], algo: str = "crc32"):
    """``(id, hashed)`` DataFrame — the hash-cache row shape
    (download.py:95-98, FIXTURES.md fingerprint tables)."""
    return df.select(
        F.col(key).alias("id"), row_fingerprint(data_columns, algo).alias("hashed")
    )
