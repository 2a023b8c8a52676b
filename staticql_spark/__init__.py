"""staticql_spark — a PySpark-native engine with the query surface of
migiwa-ya/staticql plus a full Spark-SQL analytics surface.

Two surfaces over one core (SURVEY §7.0):

1. staticql surface::

       sql = define(config)(base_dir="/data/content")
       page = sql.from_("herbs").where("slug", "eq", "arctium-lappa").exec()

2. Spark-native surface: every source is a DataFrame / temp view; full
   Spark SQL (joins, aggregations, windows) plus the large-scale operators
   in ``staticql_spark.operators`` (dedup, similarity search, text
   analysis, multimodal plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import Relation, SourceConfig, resolve_config
from .plans.filters import Filter, NeedsIndexError
from .query import QueryBuilder
from .session import get_spark
from .sources.parsers import register_parser
from .sources.reader import read_source

__all__ = [
    "StaticQL",
    "define",
    "get_spark",
    "register_parser",
    "Filter",
    "NeedsIndexError",
    "Relation",
    "SourceConfig",
    "QueryBuilder",
]


class StaticQL:
    """Session object: catalog of sources -> DataFrames + query builders.

    Parity: defineStaticQL(config)({repository, options}) — src/index.ts
    :13-55 / src/StaticQL.ts:64-87.
    """

    def __init__(
        self,
        configs: dict[str, SourceConfig],
        base_dir: str = "",
        spark: SparkSession | None = None,
        strict_index: bool = True,
        dataframes: dict[str, DataFrame] | None = None,
        indexers: dict[str, object] | None = None,
        prefer_gzip: bool = False,
    ):
        self.spark = spark or get_spark()
        self.configs = configs
        self.base_dir = base_dir
        self.strict_index = strict_index
        self.indexers = dict(indexers or {})  # "{source}.{field}" -> callback (U2)
        # an http(s):// base_dir selects the CDN backend; prefer_gzip is its
        # ".gz first" content-fetch option (reference options.preferGzip)
        self.prefer_gzip = prefer_gzip
        self._dfs: dict[str, DataFrame] = dict(dataframes or {})

    def df(self, name: str) -> DataFrame:
        if name not in self.configs:
            raise ValueError(f"unknown source: {name}")
        if name not in self._dfs:
            cfg = self.configs[name]
            # per-source storage routing (MultiRepository.ts:47-80): a source
            # with its own baseDir reads from that repository; others share
            # the session base_dir.
            self._dfs[name] = read_source(
                self.spark,
                cfg,
                cfg.base_dir if cfg.base_dir is not None else self.base_dir,
                prefer_gzip=self.prefer_gzip,
            )
        return self._dfs[name]

    def register_views(self) -> None:
        for name in self.configs:
            self.df(name).createOrReplaceTempView(name)

    def from_(self, name: str) -> QueryBuilder:
        if name not in self.configs:
            raise ValueError(f"unknown source: {name}")
        dfs = {n: self.df(n) for n in self.configs}
        return QueryBuilder(
            dfs[name], self.configs[name], dfs, self.configs, self.strict_index
        )

    def sql(self, query: str) -> DataFrame:
        self.register_views()
        return self.spark.sql(query)

    def save_indexes(self, out_dir: str) -> None:
        from .indexing import save_indexes

        save_indexes(self, out_dir)


def define(config: dict, **defaults):
    """``define(config)(base_dir=..., spark=...) -> StaticQL`` — mirrors the
    reference's curried ``defineStaticQL(config)({repository})``."""
    configs = resolve_config(config)

    def _init(
        base_dir: str = "",
        spark: SparkSession | None = None,
        strict_index: bool = True,
        dataframes: dict[str, DataFrame] | None = None,
        indexers: dict[str, object] | None = None,
        **kw,
    ) -> StaticQL:
        return StaticQL(
            configs,
            base_dir=base_dir,
            spark=spark,
            strict_index=strict_index,
            dataframes=dataframes,
            indexers=indexers,
            **kw,
        )

    for k, v in defaults.items():
        _init.__dict__[k] = v
    return _init
