"""Wiki-family classification (F9, reference:wikis.py:1-11): map a wiki
domain to its project family name.  Python form for the extractor /
serving layer, Column form for DataFrame plans (pure built-ins, no UDF).
Behavior pinned by the reference's own tests
(reference:tests/test_wikis.py:1-14), mirrored in tests/test_wikis.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def get_family(domain: str) -> str:
    if domain == "species.wikimedia.org":
        return "Wikispecies"
    if domain == "commons.wikimedia.org":
        return "Wikimedia Commons"
    parts = domain.split(".")
    if len(parts) == 3:
        return parts[1].capitalize()
    return parts[0].capitalize()


def wiki_family(domain: Column) -> Column:
    """Column twin of :func:`get_family` — chained ``when`` over split
    parts, whole-stage-codegen friendly."""
    parts = F.split(domain, "\\.")
    picked = F.when(F.size(parts) == 3, F.element_at(parts, 2)).otherwise(
        F.element_at(parts, 1)
    )
    return (
        F.when(domain == "species.wikimedia.org", F.lit("Wikispecies"))
        .when(domain == "commons.wikimedia.org", F.lit("Wikimedia Commons"))
        .otherwise(F.initcap(picked))
    )
