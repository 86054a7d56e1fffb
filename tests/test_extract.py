"""extract_text: tag strip + entity decode semantics, and the north
rule's byte-identity invariant over the full pages table."""

from pyspark.sql import functions as F

from linear_quadtree_spark.operators.crawl import extract_text
from linear_quadtree_spark.sources.pages import pages_table

CASES = [
    ("<p>plain</p>", "plain"),
    ("<div class='x'>a<br/>b</div>", "ab"),
    ("5 &lt; 6 &amp; 7 &gt; 2", "5 < 6 & 7 > 2"),
    ("&quot;q&quot; &#39;s&#39;", "\"q\" 's'"),
    # single-pass decode: &amp;lt; is the LITERAL text "&lt;", not "<"
    ("&amp;lt;", "&lt;"),
    ("no markup at all", "no markup at all"),
    ("<a href=\"x?a=1&amp;b=2\">link</a>", "link"),
]


def test_extraction_semantics(spark):
    df = spark.createDataFrame(
        [(i, h.encode()) for i, (h, _) in enumerate(CASES)], "i: int, html: binary"
    )
    got = {r.i: r.extracted_text for r in extract_text(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


def test_pages_byte_identity(spark, sf_dir):
    pages = extract_text(pages_table(spark, sf_dir))
    n = pages.count()
    same = pages.filter(F.col("extracted_text") == F.col("text")).count()
    assert n > 0 and same == n
