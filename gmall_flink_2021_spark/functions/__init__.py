from pyspark.sql import Column
from pyspark.sql import functions as F

from . import text, timeutil, vectors  # noqa: F401


def money(col: Column | str) -> Column:
    """Cast to the engine's monetary type, DECIMAL(18,2).

    The reference carries every amount as BigDecimal
    (bean/OrderInfo.java:12-16); exact decimal arithmetic also makes
    aggregate results order-independent, which the DuckDB-oracle
    value-hash comparison requires (double sums are not associative).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")
