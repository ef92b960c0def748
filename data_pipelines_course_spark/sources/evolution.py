"""Schema-drift handling — the §1.3 engine decision.

Reference lineage: luigi/taxi_data_import.py:105-126 keeps two hardcoded
column lists (the 2009 vs 2016 NYC-taxi schemas) and picks one by
set-difference against the file's header (taxi_data_import.py:143-144),
then addresses lat/lon columns POSITIONALLY (columns[14..17],
taxi_data_import.py:145-150). Both moves break silently the day a third
era appears.

The engine replaces the heuristic with declarative column mapping:
- each era is a rename map onto ONE canonical schema;
- files from any era union by NAME (`unionByName(allowMissingColumns)`),
  never by position — absent columns become typed nulls;
- parquet-side evolution is Spark's own `mergeSchema` read option.

Scale note: the era normalization is pure projection (no shuffle); a
100 TB backfill across schema eras reads each file once and unions
lazily — Catalyst still pushes filters below the union into every scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..session import configure


def normalize_era(df: DataFrame, canonical: T.StructType,
                  renames: dict[str, str] | None = None) -> DataFrame:
    """Project one era's frame onto the canonical schema: apply renames
    (era name → canonical name), add missing columns as typed nulls, cast
    everything to the canonical type, drop extras."""
    renames = renames or {}
    for old, new in renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    cols = []
    for field in canonical.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType)
                        .alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_eras_csv(spark: SparkSession, canonical: T.StructType,
                  eras: list[tuple[str, dict[str, str]]],
                  header: bool = True) -> DataFrame:
    """Read N schema eras of CSV data as one canonical frame.

    `eras` is [(path_or_glob, renames), ...] — one entry per era, in any
    order. Each era is schema-inferred from its own header (the one place
    the engine allows inference: the files predate the registry), then
    normalized and unioned by name.
    """
    configure(spark)
    frames = []
    for path, renames in eras:
        raw = spark.read.csv(path, header=header, inferSchema=True)
        frames.append(normalize_era(raw, canonical, renames))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet-side evolution: newer files may carry added columns; the
    merged read resolves the union schema (older files yield nulls)."""
    configure(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)
