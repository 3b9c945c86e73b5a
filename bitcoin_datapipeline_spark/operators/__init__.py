"""Relational operators (SURVEY.md §2.3-§2.9 + §7.2.8 extensions).

Shared conventions:
- every operator is a pure ``DataFrame -> DataFrame`` function;
- all float outputs are rounded to 6 decimals (both here and in the DuckDB
  oracle) so cross-engine summation-order noise (~1e-12) can't flip the
  driver's value hash;
- event-time arithmetic is integer epoch-ms only.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F


def r6(c: Column) -> Column:
    """Round a double column to 6 dp — the engine/oracle parity contract."""
    return F.round(c, 6)
