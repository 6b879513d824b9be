"""Corrupt-input handling for the .mwrev.zst source: fail-fast by
default, skip-and-continue in permissive mode."""

import pytest

from wiki_references_db_spark.sources.mwrev import (
    read_mwrev_bundles,
    write_mwrev_zst,
)
from tests.test_wiki_pipeline import FIXTURE


def _bundles(tmp_path):
    bundles = tmp_path / "bundles"
    bundles.mkdir()
    write_mwrev_zst(str(bundles / "good.mwrev.zst"), FIXTURE[:5])
    (bundles / "bad.mwrev.zst").write_bytes(b"\x00not zstd at all\xff\xfe")
    return bundles


def test_corrupt_bundle_fails_fast_by_default(spark, tmp_path):
    bundles = _bundles(tmp_path)
    with pytest.raises(Exception):
        read_mwrev_bundles(spark, str(bundles)).count()


def test_corrupt_bundle_skipped_in_permissive_mode(spark, tmp_path):
    bundles = _bundles(tmp_path)
    df = read_mwrev_bundles(spark, str(bundles), skip_corrupt=True)
    rows = df.collect()
    assert {r.revision_id for r in rows} == {1001, 1002, 1003, 1004, 1005}
    assert {r.source_bundle for r in rows} == {"good.mwrev.zst"}
