"""Catalog layer: source configs, JSON-schema -> Spark StructType, relations.

Reference semantics (structural parity, not a port):
- source config shape: /root/reference/src/SourceConfigResolver.ts:23-30
  (name, pattern, type, schema, relations, index)
- relation shapes: /root/reference/src/types.ts:20-38 (hasOne/hasMany/
  belongsTo/belongsToMany with localKey/foreignKey; *Through with a 4-key
  path via an intermediate source)
- index derivation: /root/reference/src/IndexConfigFactory.ts:33-102 —
  always index ``slug``; add user-declared fields; auto-derive an index for
  every relation key on both sides.

Spark stance: "indexed" is metadata only — any column is filterable — but we
keep the set to reproduce the reference's needs-index error (QueryBuilder.ts
:332-352) and to know which columns a covering index / ``peek()`` carries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

DIRECT_RELATION_TYPES = {"hasOne", "hasMany", "belongsTo", "belongsToMany"}
THROUGH_RELATION_TYPES = {"hasOneThrough", "hasManyThrough"}


@dataclass
class Relation:
    """One declared relation edge (reference: src/types.ts:20-38)."""

    name: str
    rel_type: str
    to: str  # target source name
    local_key: str = "slug"
    foreign_key: str = "slug"
    # through-relation fields (hasOneThrough / hasManyThrough)
    through: str | None = None
    source_local_key: str | None = None
    through_foreign_key: str | None = None
    through_local_key: str | None = None
    target_foreign_key: str | None = None

    def __post_init__(self) -> None:
        if self.rel_type not in DIRECT_RELATION_TYPES | THROUGH_RELATION_TYPES:
            raise ValueError(f"unknown relation type: {self.rel_type}")
        if self.is_through and not all(
            [self.through, self.source_local_key, self.through_foreign_key,
             self.through_local_key, self.target_foreign_key]
        ):
            raise ValueError(f"through relation {self.name!r} missing key path")

    @property
    def is_through(self) -> bool:
        return self.rel_type in THROUGH_RELATION_TYPES

    @property
    def is_to_one(self) -> bool:
        return self.rel_type in ("hasOne", "hasOneThrough")


@dataclass
class SourceConfig:
    """One source (≈ table). ``path`` may point at raw content files
    (markdown/yaml/json, parsed by ``type``) or at parquet directly."""

    name: str
    pattern: str = ""
    type: str = "parquet"  # markdown | yaml | json | parquet | csv | <custom>
    schema: dict | None = None  # JSON-schema draft-07 subset
    relations: dict[str, Relation] = field(default_factory=dict)
    index_fields: list[str] = field(default_factory=list)
    index_depth: int = 1
    # per-source storage root override (reference MultiRepository.ts:47-80:
    # each source may live in its own repository, e.g. content on FS + one
    # source on a CDN).  None -> the session-wide base_dir.
    base_dir: str | None = None

    def __post_init__(self) -> None:
        if not 1 <= self.index_depth <= 10:
            # reference: src/IndexConfigFactory.ts:165-167
            raise ValueError(f"[{self.name}] indexDepth must be 1..10")

    def spark_schema(self) -> T.StructType | None:
        if self.schema is None:
            return None
        struct = json_schema_to_struct(self.schema)
        names = {f.name for f in struct.fields}
        fields = list(struct.fields)
        # implicit columns: slug PK + raw original text (src/types.ts:11-15)
        if "slug" not in names:
            fields.insert(0, T.StructField("slug", T.StringType(), False))
        if "raw" not in names:
            fields.append(T.StructField("raw", T.StringType(), True))
        return T.StructType(fields)


_SCALAR = {
    "string": T.StringType(),
    "number": T.DoubleType(),
    "integer": T.LongType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "null": T.NullType(),
}


def _json_type_to_spark(js: dict) -> T.DataType:
    t = js.get("type")
    # union types like ["string", "null"] -> the non-null member
    # (reference: src/validator/simpleValidate.ts:27-36)
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        t = non_null[0] if non_null else "null"
    if t == "array":
        item = js.get("items") or {"type": "string"}
        return T.ArrayType(_json_type_to_spark(item))
    if t == "object":
        return json_schema_to_struct(js)
    if t in _SCALAR:
        return _SCALAR[t]
    raise ValueError(f"unsupported JSON-schema type: {t!r}")


def json_schema_to_struct(js: dict) -> T.StructType:
    """JSON-schema (draft-07 subset per simpleValidate.ts:10-115) -> StructType."""
    props = js.get("properties", {})
    required = set(js.get("required", []))
    fields = [
        T.StructField(name, _json_type_to_spark(sub), nullable=name not in required)
        for name, sub in props.items()
    ]
    return T.StructType(fields)


def _parse_relation(name: str, raw: dict) -> Relation:
    rel_type = raw.get("type")
    if rel_type in THROUGH_RELATION_TYPES:
        return Relation(
            name=name,
            rel_type=rel_type,
            to=raw["to"],
            through=raw["through"],
            source_local_key=raw["sourceLocalKey"],
            through_foreign_key=raw["throughForeignKey"],
            through_local_key=raw["throughLocalKey"],
            target_foreign_key=raw["targetForeignKey"],
        )
    return Relation(
        name=name,
        rel_type=rel_type,
        to=raw["to"],
        local_key=raw.get("localKey", "slug"),
        foreign_key=raw.get("foreignKey", "slug"),
    )


def resolve_config(config: dict) -> dict[str, SourceConfig]:
    """Normalize a staticql-style config dict into SourceConfigs.

    Mirrors SourceConfigResolver.resolveOne (SourceConfigResolver.ts:75-101)
    + IndexConfigFactory.buildForSource (IndexConfigFactory.ts:33-102):
    every source gets a slug index; relation keys are auto-indexed on both
    sides (the scan over *other* sources' relations is :130-163).
    """
    sources: dict[str, SourceConfig] = {}
    raw_sources: dict[str, dict] = config.get("sources", {})
    for name, raw in raw_sources.items():
        relations = {
            rel_name: _parse_relation(rel_name, rel_raw)
            for rel_name, rel_raw in (raw.get("relations") or {}).items()
        }
        sources[name] = SourceConfig(
            name=name,
            pattern=raw.get("pattern", ""),
            type=raw.get("type", "parquet"),
            schema=raw.get("schema"),
            relations=relations,
            index_fields=list(raw.get("index") or []),
            index_depth=int(raw.get("indexDepth", 1)),
            base_dir=raw.get("baseDir"),
        )

    # index derivation: slug always; own relation local keys; foreign keys of
    # relations in *other* sources that point here.
    for cfg in sources.values():
        indexed = {"slug", *cfg.index_fields}
        for rel in cfg.relations.values():
            if rel.is_through:
                indexed.add(rel.source_local_key)
            else:
                indexed.add(rel.local_key)
        for other in sources.values():
            for rel in other.relations.values():
                if rel.is_through:
                    if rel.to == cfg.name:
                        indexed.add(rel.target_foreign_key)
                    if rel.through == cfg.name:
                        indexed.add(rel.through_foreign_key)
                        indexed.add(rel.through_local_key)
                elif rel.to == cfg.name:
                    indexed.add(rel.foreign_key)
        # relation-path indexes like "herbs.slug" stay as declared
        cfg.index_fields = sorted(indexed)
    return sources
