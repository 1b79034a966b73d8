"""Scale utilities (SURVEY.md §4 'skew handling'): the two knobs that
matter when AQE alone isn't enough at 100 TB.

- salted_join: explicit skew-split for a hot key joining a replicable
  right side. The left (skewed) side gets a deterministic salt derived
  from a row-unique column; the right side is exploded across all salt
  values; the join key becomes (key, salt) so one hot key spreads over
  N reducers. AQE's skew-join split handles sort-merge skew
  automatically - this helper is for when the right side must be
  replicated anyway (e.g. huge dim that can't broadcast) or when AQE is
  off (streaming joins).

- bucketed co-located join: write both sides bucketed+sorted on the
  join key (Hive-bucketed tables); Spark then sort-merge-joins them
  with NO exchange on either side - the shuffle is paid once at write
  time and amortized over every downstream join. This is the 100 TB
  answer for fact-to-fact joins repeated across a pipeline DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left (skewed on ``key``) to right, spreading each key over
    ``salt_buckets`` reducers. ``unique_col`` seeds the deterministic
    salt (defaults to the first non-key column of ``left``).

    Only inner/left joins are supported: the right side is exploded
    ``salt_buckets`` times, so an outer join's unmatched right rows
    would be replicated once per salt bucket in the output."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "exploded right side would replicate unmatched outer rows"
        )
    ucol = unique_col or next(c for c in left.columns if c != key)
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(ucol)), F.lit(salt_buckets)).cast("int")
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(exploded_right, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist df as a Hive-bucketed (and optionally sorted) table so
    downstream equi-joins/aggregations on ``key`` skip their exchange.
    Pass ``path`` to create an EXTERNAL bucketed table at an explicit
    location (otherwise the session warehouse dir - which is cwd-
    relative by default - receives a managed table). Note: catalog
    initialization still creates an EMPTY ``spark-warehouse/`` marker
    dir in the session's warehouse location either way; table data goes
    only to ``path``."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The in-memory catalog forgets tables across sessions but their
    # data directories persist; clear a stale location.
    import shutil
    from urllib.parse import urlparse

    if path is None:
        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        ).path
        shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    else:
        shutil.rmtree(path, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key: sort-merge with
    zero Exchange nodes (asserted in tests/test_scale.py). The merge
    hint pins SMJ - at test scale AQE would otherwise broadcast the
    small side and mask the property being demonstrated; at 100 TB
    fact-to-fact sizes SMJ is what Spark picks anyway."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), key)
    )
