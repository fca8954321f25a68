"""SURVEY §2 / CATALOG.md ↔ REGISTRY synchronization gate.

Round-5/6 reviews found ~90 registry entries undeclared in SURVEY §2 and
a full-catalog correctness artifact trailing the registry. These tests
make the drift impossible to reintroduce: the generated inventory block
in SURVEY.md and the CATALOG.md index must byte-match a regeneration
from the live REGISTRY, and the declared name set must equal the
registry key set in BOTH directions.
"""

from __future__ import annotations

import re

from es_analytics_spark import catalog_gen
from es_analytics_spark.queries import REGISTRY


def _survey_text() -> str:
    with open(catalog_gen.SURVEY_PATH) as f:
        return f.read()


def _inventory_block() -> str:
    text = _survey_text()
    m = re.search(
        re.escape(catalog_gen.BEGIN) + r".*?" + re.escape(catalog_gen.END),
        text,
        re.DOTALL,
    )
    assert m, "SURVEY.md is missing the generated catalog inventory block"
    return m.group(0)


def test_survey_inventory_matches_registry_exactly():
    block = _inventory_block()
    declared = set(re.findall(r"`([a-z0-9_]+)`", block.split("|---|---|---|")[-1]))
    registry = set(REGISTRY)
    assert declared - registry == set(), (
        f"SURVEY declares entries absent from REGISTRY: {sorted(declared - registry)[:10]}"
    )
    assert registry - declared == set(), (
        f"REGISTRY entries undeclared in SURVEY §2: {sorted(registry - declared)[:10]}"
    )


def test_survey_inventory_block_is_regeneration_fresh():
    assert _inventory_block() == catalog_gen.generate_survey_inventory(), (
        "SURVEY §2 inventory is stale — run python -m es_analytics_spark.catalog_gen"
    )


def test_catalog_md_is_regeneration_fresh():
    with open(catalog_gen.CATALOG_PATH) as f:
        on_disk = f.read()
    assert on_disk == catalog_gen.generate_catalog_md(), (
        "CATALOG.md is stale — run python -m es_analytics_spark.catalog_gen"
    )


def test_catalog_md_covers_every_entry_with_anchor():
    with open(catalog_gen.CATALOG_PATH) as f:
        text = f.read()
    for name in REGISTRY:
        assert f"`{name}`" in text, f"{name} missing from CATALOG.md"
    # anchors are real repo-relative file:line references
    anchors = re.findall(r"`(es_analytics_spark/[\w./]+):(\d+)`", text)
    assert len(anchors) >= len(REGISTRY)
    import os

    repo = catalog_gen.REPO
    for path, _line in set(anchors):
        assert os.path.exists(os.path.join(repo, path)), f"dangling anchor {path}"
