"""S5/S7 config catalog: listing, CRUD, the reference's extension gate and
upload cap, exclusion of app-specific buckets, and the fail-fast deviations
documented in sources/catalog.py."""

from __future__ import annotations

import os

import pytest

from radar_log_parser_spark.config import ConfigError
from radar_log_parser_spark.sources.catalog import (
    MAX_CONFIG_BYTES,
    ConfigCatalog,
)

GOOD_YAML = """\
SpecificProcess:
  CameraService: '(?m)^.*CameraService.*$'
"""


@pytest.fixture()
def cat(tmp_path):
    return ConfigCatalog(str(tmp_path), excluded_buckets=frozenset({"app-infra"}))


def test_upload_list_display_roundtrip(cat):
    m = cat.upload("configs", "a.yaml", GOOD_YAML, create_bucket=True)
    assert m == {"configs": ["a.yaml"]}
    assert cat.list_buckets() == ["configs"]
    assert cat.list_configs("configs") == ["a.yaml"]
    assert cat.display("configs", "a.yaml") == GOOD_YAML
    # the parsed-config path goes through the S6 fail-fast lint
    spec = cat.load("configs", "a.yaml")
    assert "CameraService" in spec.specific_process


def test_extension_gate_reference_error_text(cat):
    """settings.go:43-45: only .yml/.yaml accepted, error 'Invalid Format'."""
    with pytest.raises(ConfigError, match="Invalid Format"):
        cat.upload("configs", "a.txt", GOOD_YAML, create_bucket=True)
    cat.upload("configs", "a.yml", GOOD_YAML, create_bucket=True)  # .yml ok


def test_upload_cap(cat):
    with pytest.raises(ConfigError, match="upload cap"):
        cat.upload(
            "configs", "big.yaml", "#" * (MAX_CONFIG_BYTES + 1),
            create_bucket=True,
        )


def test_upload_missing_bucket_without_create(cat):
    """The reference only creates a bucket on the explicit 'Create Bucket'
    branch (settings.go:29-38); otherwise the write targets an existing
    bucket."""
    with pytest.raises(ConfigError, match="no such bucket"):
        cat.upload("nope", "a.yaml", GOOD_YAML)


def test_app_specific_buckets_excluded_from_map(cat):
    """main.go:61-68: app-infrastructure buckets never enter the config
    map, but remain listable as raw buckets."""
    cat.upload("configs", "a.yaml", GOOD_YAML, create_bucket=True)
    cat.upload("app-infra", "deploy.yaml", GOOD_YAML, create_bucket=True)
    assert cat.fill_config_map() == {"configs": ["a.yaml"]}
    assert cat.list_buckets() == ["app-infra", "configs"]


def test_delete_updates_map(cat):
    cat.upload("configs", "a.yaml", GOOD_YAML, create_bucket=True)
    cat.upload("configs", "b.yaml", GOOD_YAML)
    assert cat.delete("configs", "a.yaml") == {"configs": ["b.yaml"]}
    with pytest.raises(ConfigError, match="no such config"):
        cat.delete("configs", "a.yaml")


def test_save_replaces_existing_only(cat):
    cat.upload("configs", "a.yaml", GOOD_YAML, create_bucket=True)
    cat.save("configs", "a.yaml", GOOD_YAML + "Priority:\n  X: 1\n")
    assert "Priority" in cat.display("configs", "a.yaml")
    with pytest.raises(ConfigError, match="no such config"):
        cat.save("configs", "new.yaml", GOOD_YAML)


def test_path_traversal_rejected(cat, tmp_path):
    for bad in ("../escape", "a/b", "", "."):
        with pytest.raises(ConfigError):
            cat.upload(bad, "a.yaml", GOOD_YAML, create_bucket=True)
    cat.upload("configs", "a.yaml", GOOD_YAML, create_bucket=True)
    with pytest.raises(ConfigError):
        cat.display("configs", "../../etc/passwd")
    assert not os.path.exists(tmp_path / "escape")


def test_catalog_df(cat, spark):
    cat.upload("c1", "a.yaml", GOOD_YAML, create_bucket=True)
    cat.upload("c2", "b.yaml", GOOD_YAML, create_bucket=True)
    rows = sorted(
        (r["bucket"], r["config"]) for r in cat.catalog_df(spark).collect()
    )
    assert rows == [("c1", "a.yaml"), ("c2", "b.yaml")]
