"""XPath extraction functions (SURVEY.md §2.12, round 8).

``xpath_string`` / ``xpath_int`` / ``xpath`` evaluate real XPath over
XML fragments — a separate evaluation engine from the schema-driven
``from_xml`` that fn_xml / fn_xml_struct cover (scans.py XML ops read
documents; these navigate paths inside a value).

Oracle design: the XML is CONSTRUCTED from row values inside the op,
and the oracle recomputes the extracted values straight from the same
base columns — so the round trip (build XML -> XPath it back) must
reproduce ground truth exactly, proving the path evaluation rather
than assuming it. Map-only over one grouped frame; the XPath calls
are JVM expressions (no UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order XML document (key + sorted line-number list) built
    with string ops, then re-extracted with xpath_int (scalar int
    path), xpath (node-set path -> array, joined to CSV) and
    xpath_string (first-node string path)."""
    li = load_table(spark, sf_dir, "lineitem").where("l_orderkey % 17 = 0")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_linenumber").cast("int"))).alias(
            "lns"
        ),
        F.min("l_returnflag").alias("flag0"),
    )
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("l_orderkey").cast("string"),
        F.lit("</k><f>"),
        F.col("flag0"),
        F.lit("</f><ls>"),
        F.array_join(
            F.transform(
                "lns",
                lambda x: F.concat(
                    F.lit("<l>"), x.cast("string"), F.lit("</l>")
                ),
            ),
            "",
        ),
        F.lit("</ls></o>"),
    )
    doc = per_order.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"), xml.alias("xml")
    )
    return doc.select(
        "l_orderkey",
        F.xpath_int("xml", F.lit("/o/k")).cast("long").alias("key_back"),
        F.xpath_string("xml", F.lit("/o/f")).alias("flag_back"),
        F.array_join(
            F.xpath("xml", F.lit("/o/ls/l/text()")), ","
        ).alias("lines_csv"),
        F.size(F.xpath("xml", F.lit("/o/ls/l"))).cast("long").alias("n_lines"),
    )


_XPATH_SQL = """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_orderkey AS BIGINT) AS key_back,
       MIN(l_returnflag) AS flag_back,
       string_agg(CAST(l_linenumber AS VARCHAR), ','
                  ORDER BY l_linenumber) AS lines_csv,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem WHERE l_orderkey % 17 = 0
GROUP BY l_orderkey
"""

QUERIES["fn_xpath"] = fn_xpath
ORACLE["fn_xpath"] = _XPATH_SQL
