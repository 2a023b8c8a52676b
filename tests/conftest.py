from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from staticql_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ---------------------------------------------------------------------------
# Herbal fixture corpus — content per FIXTURES.md (shapes/values mirror the
# reference's tests/content/, written fresh as markdown + multi-record YAML).
# ---------------------------------------------------------------------------

HERBS = {
    "arctium-lappa.md": """---
name: ゴボウ
compoundSlugs:
  - inulin
  - arctigenin
tagSlugs:
  - antioxidant
  - antiinflammatory
overview: ゴボウの概要
efficacy:
---
body of arctium
""",
    "centella-asiatica.md": """---
name: ゴツゴラ
compoundSlugs:
  - asiaticoside
  - madecassoside
tagSlugs:
  - memory
  - skin
overview: ゴツゴラの概要
efficacy: 記憶力
---
body of centella
""",
    "cymbopogon-citratus.md": """---
name: レモングラス
compoundSlugs:
  - citral
  - geraniol
tagSlugs:
  - relaxation
  - antibacterial
overview: レモングラスの概要
efficacy: リラックス
---
body of cymbopogon
""",
}

TAGS_YAML = """- slug: antioxidant
  name: 抗酸化
- slug: antiinflammatory
  name: 抗炎症
- slug: relaxation
  name: リラックス
- slug: antibacterial
  name: 抗菌
- slug: memory
  name: 記憶
- slug: skin
  name: 肌
"""

COMPOUNDS_YAML = """- slug: asiaticoside
  name: アジアチコシド
- slug: madecassoside
  name: マデカッソシド
- slug: inulin
  name: イヌリン
- slug: citral
  name: シトラール
- slug: geraniol
  name: ゲラニオール
"""

RECIPE_GROUPS_YAML = """- slug: recipeGroup001
  processSlug: infusion
  combinedHerbs:
    - slug: arctium-lappa
      herbStateSlug: dry
      herbPartSlug: root
- slug: recipeGroup002
  processSlug: infusion
  combinedHerbs:
    - slug: centella-asiatica
      herbStateSlug: dry
      herbPartSlug: leaf
    - slug: cymbopogon-citratus
      herbStateSlug: dry
      herbPartSlug: leaf
"""

PROCESSES_YAML = """- slug: infusion
  name: 浸出
- slug: decoction
  name: 煎出
- slug: tincture
  name: チンキ
- slug: powder
  name: 粉末
- slug: poultice
  name: 湿布
- slug: bath
  name: 薬湯
"""

RECIPES = {
    "recipeGroup001/001.md": """---
recipeGroupSlug: recipeGroup001
summary: ゴボウ茶
processSlug: infusion
recipe:
  - 乾燥させる
  - 煮出す
---
""",
    "recipeGroup002/001.md": """---
recipeGroupSlug: recipeGroup002
summary: ハーブブレンド
processSlug: infusion
recipe:
  - 混ぜる
  - 浸出する
---
""",
}

STRING_SCHEMA = {"type": "string"}
STR_ARRAY = {"type": "array", "items": {"type": "string"}}

CONFIG = {
    "sources": {
        "herbs": {
            "pattern": "content/herbs/*.md",
            "type": "markdown",
            "schema": {
                "type": "object",
                "properties": {
                    "name": STRING_SCHEMA,
                    "compoundSlugs": STR_ARRAY,
                    "tagSlugs": STR_ARRAY,
                    "overview": STRING_SCHEMA,
                    "efficacy": {"type": ["string", "null"]},
                },
                "required": ["name", "tagSlugs", "overview"],
            },
            "relations": {
                "compounds": {
                    "type": "hasMany",
                    "to": "compounds",
                    "localKey": "compoundSlugs",
                    "foreignKey": "slug",
                },
                "tags": {
                    "type": "hasMany",
                    "to": "tags",
                    "localKey": "tagSlugs",
                    "foreignKey": "slug",
                },
                "recipes": {
                    "type": "hasManyThrough",
                    "to": "recipes",
                    "through": "recipeGroups",
                    "sourceLocalKey": "slug",
                    "throughForeignKey": "combinedHerbs.slug",
                    "throughLocalKey": "slug",
                    "targetForeignKey": "recipeGroupSlug",
                },
            },
            "index": ["name", "compoundSlugs", "tagSlugs"],
        },
        "tags": {
            "pattern": "content/tags.yaml",
            "type": "yaml",
            "schema": {
                "type": "object",
                "properties": {"name": STRING_SCHEMA},
                "required": ["name"],
            },
        },
        "compounds": {
            "pattern": "content/compounds.yaml",
            "type": "yaml",
            "schema": {
                "type": "object",
                "properties": {"name": STRING_SCHEMA},
                "required": ["name"],
            },
        },
        "recipes": {
            "pattern": "content/recipes/**/*.md",
            "type": "markdown",
            "schema": {
                "type": "object",
                "properties": {
                    "recipeGroupSlug": STRING_SCHEMA,
                    "summary": {"type": ["string", "null"]},
                    "processSlug": {"type": ["string", "null"]},
                    "recipe": STR_ARRAY,
                },
                "required": ["recipeGroupSlug", "recipe"],
            },
            "relations": {
                "herbs": {
                    "type": "hasManyThrough",
                    "to": "herbs",
                    "through": "recipeGroups",
                    "sourceLocalKey": "recipeGroupSlug",
                    "throughForeignKey": "slug",
                    "throughLocalKey": "combinedHerbs.slug",
                    "targetForeignKey": "slug",
                },
                "process": {
                    "type": "hasOneThrough",
                    "to": "processes",
                    "through": "recipeGroups",
                    "sourceLocalKey": "recipeGroupSlug",
                    "throughForeignKey": "slug",
                    "throughLocalKey": "processSlug",
                    "targetForeignKey": "slug",
                },
            },
            "index": ["herbs.slug"],
        },
        "recipeGroups": {
            "pattern": "content/recipeGroups.yaml",
            "type": "yaml",
            "schema": {
                "type": "object",
                "properties": {
                    "processSlug": STRING_SCHEMA,
                    "combinedHerbs": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "properties": {
                                "slug": STRING_SCHEMA,
                                "herbStateSlug": STRING_SCHEMA,
                                "herbPartSlug": STRING_SCHEMA,
                            },
                            "required": ["slug"],
                        },
                    },
                },
                "required": ["processSlug", "combinedHerbs"],
            },
        },
        "processes": {
            "pattern": "content/processes.yaml",
            "type": "yaml",
            "schema": {
                "type": "object",
                "properties": {"name": STRING_SCHEMA},
                "required": ["name"],
            },
        },
    }
}


@pytest.fixture(scope="session")
def content_dir(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("herbal")
    (root / "content" / "herbs").mkdir(parents=True)
    for fname, body in HERBS.items():
        (root / "content" / "herbs" / fname).write_text(body, encoding="utf-8")
    (root / "content" / "tags.yaml").write_text(TAGS_YAML, encoding="utf-8")
    (root / "content" / "compounds.yaml").write_text(COMPOUNDS_YAML, encoding="utf-8")
    (root / "content" / "recipeGroups.yaml").write_text(RECIPE_GROUPS_YAML, encoding="utf-8")
    (root / "content" / "processes.yaml").write_text(PROCESSES_YAML, encoding="utf-8")
    for rel, body in RECIPES.items():
        p = root / "content" / "recipes" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body, encoding="utf-8")
    return root


@pytest.fixture(scope="session")
def herbal(spark, content_dir):
    from staticql_spark import define

    return define(CONFIG)(base_dir=str(content_dir), spark=spark)
