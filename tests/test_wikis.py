"""Wiki-family mapping (F9) — the reference's own vectors
(reference:tests/test_wikis.py:1-14) against both the Python function
and the Column expression."""

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.functions.wikis import get_family, wiki_family

VECTORS = [
    ("www.wikidata.org", "Wikidata"),
    ("wikidata.org", "Wikidata"),
    ("commons.wikimedia.org", "Wikimedia Commons"),
    ("species.wikimedia.org", "Wikispecies"),
    ("zh.wikipedia.org", "Wikipedia"),
    ("scn.wiktionary.org", "Wiktionary"),
    ("wikisource.org", "Wikisource"),
]


@pytest.mark.parametrize("domain,family", VECTORS)
def test_get_family(domain, family):
    assert get_family(domain) == family


def test_wiki_family_column(spark):
    df = spark.createDataFrame([(d,) for d, _ in VECTORS], "domain string")
    got = {
        r.domain: r.family
        for r in df.select("domain", wiki_family(F.col("domain")).alias("family")).collect()
    }
    assert got == dict(VECTORS)
