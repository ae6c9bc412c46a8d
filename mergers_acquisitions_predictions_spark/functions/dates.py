"""Date parsing helpers (SURVEY §2.6 F5).

The reference parses `MM/dd/yy` announce dates on Spark 2.4
(`join_acquirers.scala:20-21`), where SimpleDateFormat resolves
2-digit years into [now−80, now+20). Spark 3+'s DateTimeFormatter
maps `yy` into [2000, 2100) instead — '99' becomes 2099, silently
shifting labels by a century. `to_date_pivot` restores the reference
semantics explicitly (no global `legacy.timeParserPolicy` switch, so
the rest of the engine keeps modern parsing).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_date_pivot(
    col: Column | str, fmt: str = "MM/dd/yy", pivot_year: int | None = None
) -> Column:
    """Parse with `fmt`, then fold years ≥ `pivot_year` back a century
    — SimpleDateFormat's sliding 2-digit-year window ([now−80, now+20),
    the behavior the reference ran under). `pivot_year` defaults to
    current_year + 20; pass a fixed value for reproducible pipelines."""
    d = F.to_date(col, fmt)
    pivot = pivot_year or (dt.date.today().year + 20)
    return F.when(F.year(d) >= pivot, F.add_months(d, -1200)).otherwise(d)
