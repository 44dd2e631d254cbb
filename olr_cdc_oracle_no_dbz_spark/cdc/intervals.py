"""Interval / unknown-type decode (SURVEY.md §2.3 P5).

The shipped OLR config selects explicit encodings for Oracle INTERVAL
columns (``interval-dts: 9``, ``interval-ytm: 4``,
scripts/OpenLogReplicator.json:18-19) and keeps unknown types as
printable strings (``unknown-type: 1``, :25). The engine decodes those
wire forms into Spark's native ANSI interval types so interval
arithmetic (ts + interval, ordering, comparisons) works downstream:

- INTERVAL DAY TO SECOND → ``DayTimeIntervalType`` via make_dt_interval
- INTERVAL YEAR TO MONTH → ``YearMonthIntervalType`` via make_ym_interval
- unknown types stay StringType, untouched (documented pass-through)

Parquet/DuckDB interop for interval columns is patchy (SURVEY.md §7
risk list), so these stay out of DuckDB-checked queries and are covered
by unit tests (tests/test_cdc.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: "d hh:mm:ss.ffffff" (sign optional) — the string form of
#: INTERVAL DAY TO SECOND on the wire
_DTS_RE = r"^(-?)(\d+) (\d+):(\d+):(\d+)(?:\.(\d{1,9}))?$"
#: "y-m" — the string form of INTERVAL YEAR TO MONTH
_YTM_RE = r"^(-?)(\d+)-(\d+)$"


def decode_dts(col: Column | str, encoding: str = "string") -> Column:
    """Decode an INTERVAL DAY TO SECOND wire value.

    ``encoding='string'``: ``[-]D HH:MM:SS[.FFFFFF]``;
    ``encoding='micros'``: signed integer micros (numeric OLR modes).
    """
    c = F.col(col) if isinstance(col, str) else col
    if encoding == "micros":
        # a long cast to DT-interval means SECONDS; convert µs → decimal
        # seconds first (exact for |µs| < 2^53)
        return F.make_dt_interval(
            secs=(c.cast("long") / F.lit(1_000_000.0)).cast("decimal(18,6)")
        )
    if encoding != "string":
        raise ValueError(f"dts encoding must be string|micros, got {encoding!r}")
    sign = F.when(F.regexp_extract(c, _DTS_RE, 1) == "-", -1).otherwise(1)
    part = lambda i: F.regexp_extract(c, _DTS_RE, i)  # noqa: E731
    # fraction: right-pad to micros ("5" → 500000 µs)
    frac = F.coalesce(
        F.nullif(F.rpad(part(6), 6, "0"), F.lit("")).cast("long"), F.lit(0)
    )
    magnitude = F.make_dt_interval(
        part(2).cast("int"),
        part(3).cast("int"),
        part(4).cast("int"),
        part(5).cast("decimal(18,6)") + frac / F.lit(1_000_000),
    )
    return F.when(c.rlike(_DTS_RE), magnitude * sign).otherwise(
        F.lit(None).cast("interval day to second")
    )


def decode_ytm(col: Column | str, encoding: str = "string") -> Column:
    """Decode an INTERVAL YEAR TO MONTH wire value.

    ``encoding='string'``: ``[-]Y-M``; ``encoding='months'``: signed
    integer total months.
    """
    c = F.col(col) if isinstance(col, str) else col
    if encoding == "months":
        return c.cast("int").cast("interval year to month")
    if encoding != "string":
        raise ValueError(f"ytm encoding must be string|months, got {encoding!r}")
    sign = F.when(F.regexp_extract(c, _YTM_RE, 1) == "-", -1).otherwise(1)
    years = F.regexp_extract(c, _YTM_RE, 2).cast("int")
    months = F.regexp_extract(c, _YTM_RE, 3).cast("int")
    magnitude = F.make_ym_interval(years, months)
    return F.when(c.rlike(_YTM_RE), magnitude * sign).otherwise(
        F.lit(None).cast("interval year to month")
    )
