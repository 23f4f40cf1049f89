"""BigQuery-connector write wiring, isolated and testable without the jar.

The reference's warehouse load is a BigQuery CSV load job
(``/root/reference/app/bq-importer/main.py:27-39``): explicit schema from
the staged JSON, ``skip_leading_rows = 0``, ``write_disposition =
"WRITE_TRUNCATE"``.  On Spark the equivalent is the open-source
spark-bigquery-connector (``.format("bigquery")``); this module assembles
its documented option set so a deployment that ships the jar gets a working
write from config alone, while this container (no GCP, no jar) unit-tests
the option assembly and that the branch reaches Spark's datasource
resolution — the same pattern ``mysql_dialect.py`` uses for Connector/J.

Reference load-job config → connector equivalents:

=========================  ===============================================
bq-importer (main.py)      spark-bigquery-connector
=========================  ===============================================
``write_disposition =      SaveMode: ``mode("overwrite")`` IS
WRITE_TRUNCATE``           WRITE_TRUNCATE (``append`` → WRITE_APPEND)
``job_config.schema``      DataFrame schema (always applied; the
(autodetect off)           connector never autodetects)
load from ``gs://`` CSV    ``writeMethod=indirect`` stages to
                           ``temporaryGcsBucket`` then issues a load job;
                           ``writeMethod=direct`` uses the Storage Write
                           API and needs no bucket
``dataset_ref.table(...)`` ``table`` = ``[project.]dataset.table`` (or
                           separate ``dataset``/``project`` options)
=========================  ===============================================

Credentials ride the platform (ADC / ``credentialsFile`` conf), never this
code — see ``sources/secrets.py`` for the resolution pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Options understood by the connector's writer, kept to the documented
#: public set so a typo fails fast here instead of silently at the API.
_KNOWN_WRITE_OPTIONS = {
    "table", "dataset", "project", "parentProject",
    "writeMethod", "temporaryGcsBucket", "persistentGcsBucket",
    "persistentGcsPath", "intermediateFormat", "createDisposition",
    "partitionField", "partitionType", "partitionExpirationMs",
    "partitionRangeStart", "partitionRangeEnd", "partitionRangeInterval",
    "clusteredFields", "allowFieldAddition", "allowFieldRelaxation",
    "writeAtLeastOnce", "datePartition",
    "credentials", "credentialsFile", "gcpAccessToken",
    "bigQueryTableLabel", "destinationTableKmsKeyName",
    "enableModeCheckForSchemaFields", "queryJobPriority",
}


def bigquery_write_options(
    table: str,
    write_method: str = "indirect",
    temporary_gcs_bucket: str | None = None,
    create_disposition: str = "CREATE_IF_NEEDED",
    intermediate_format: str = "parquet",
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """The ``.format("bigquery")`` writer option set for one table load.

    ``indirect`` (the reference-faithful mode: stage to GCS, then a load
    job — requires ``temporary_gcs_bucket``) or ``direct`` (Storage Write
    API, no staging).  WRITE_TRUNCATE itself is NOT an option: it is the
    connector's mapping of ``SaveMode.Overwrite``, so callers pair this
    dict with ``.mode("overwrite")`` — ``warehouse_write`` does.
    """
    if write_method not in ("direct", "indirect"):
        raise ValueError(f"write_method must be direct|indirect, got {write_method!r}")
    opts = {"table": table, "writeMethod": write_method,
            "createDisposition": create_disposition}
    if write_method == "indirect":
        if not temporary_gcs_bucket:
            raise ValueError(
                "indirect write stages via GCS: temporary_gcs_bucket is required "
                "(the reference's csv_exports_staging bucket role)"
            )
        opts["temporaryGcsBucket"] = temporary_gcs_bucket
        opts["intermediateFormat"] = intermediate_format
    for k, v in (extra or {}).items():
        if k not in _KNOWN_WRITE_OPTIONS:
            raise ValueError(f"unknown spark-bigquery-connector write option {k!r}")
        if k in opts:
            # never let extra silently override what the caller passed
            # positionally (a 'table' in extra would redirect the write)
            raise ValueError(
                f"option {k!r} is already set by an explicit argument "
                f"({opts[k]!r}); pass it through the argument, not extra"
            )
        opts[k] = v
    return opts


def bigquery_writer(df: DataFrame, table: str, mode: str = "overwrite", **kwargs):
    """A fully-configured (not yet executed) BigQuery DataFrameWriter.

    ``mode="overwrite"`` reproduces the reference's WRITE_TRUNCATE load.
    Calling ``.save()`` requires the connector jar on the classpath; in
    this container the call correctly fails in Spark's datasource lookup
    (asserted in tests/test_ingest_pipeline.py) — the wiring is real, the
    execution environment is not pretended.
    """
    return df.write.format("bigquery").mode(mode).options(
        **bigquery_write_options(table, **kwargs)
    )
