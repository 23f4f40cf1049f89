"""JDBC source: the Spark-native replacement for the reference's Cloud SQL
export path (SURVEY.md §2A #1/#4/#5; entry point 2 lifecycle §3).

The reference moves tables by asking the Cloud SQL Admin API to dump
``SELECT *`` to CSV and polling (``/root/reference/app/cloud-sql-exporter/
export_table.py:5-34``).  Spark replaces the whole dance with a partitioned
JDBC scan: executors read key ranges in parallel, no 540 s wall limit, no
batch requeue, retries built in.

No MySQL ships in this container, but the Spark distribution bundles
embedded Apache Derby (its Hive-metastore backend), so the full JDBC wiring
— option assembly, partitioned range scan, catalog-subquery pushdown, write
— is exercised end-to-end against a real database in
``tests/test_sources.py`` and the ``src_jdbc_roundtrip`` registered query.
On a deployment the same ``JdbcSource`` points at
``jdbc:mysql://host:3306/db`` (embedded Derby lives in the driver JVM; a
network database is what makes executor-parallel range reads reach across a
cluster).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tmputil import tmp_dir

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@dataclass
class JdbcSource:
    """Connection + parallelism settings for a JDBC table scan."""

    url: str  # e.g. jdbc:mysql://host:3306/db
    user: str
    password: str
    fetchsize: int = 10_000
    num_partitions: int = 32
    extra: dict[str, str] = field(default_factory=dict)

    def options_for(self, dbtable: str, partition_column: str | None = None,
                    lower_bound: int | None = None, upper_bound: int | None = None
                    ) -> dict[str, str]:
        """Assemble spark.read.format('jdbc') options.

        With a numeric ``partition_column`` + bounds, the scan is split into
        ``num_partitions`` range predicates executed concurrently — the
        parallel analog of the reference's single serverless export.
        """
        opts = {
            "url": self.url,
            "dbtable": dbtable,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetchsize),
            **self.extra,
        }
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError("partition_column requires lower_bound and upper_bound")
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def read(self, spark: SparkSession, dbtable: str, **partition_kwargs) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .options(**self.options_for(dbtable, **partition_kwargs))
            .load()
        )

    def catalog_tables_query(self, schema: str, like: str | None = None,
                             include: tuple[str, ...] = ()) -> str:
        """The reference's table-enumeration query (#1, ``variables.tf:72-75``):
        information_schema scan with optional LIKE / IN predicates, expressed
        as a pushdown subquery for ``dbtable``."""
        esc = lambda s: s.replace("'", "''")  # noqa: E731 — SQL string-literal escape
        preds = [f"table_schema = '{esc(schema)}'"]
        ors = []
        if like:
            ors.append(f"table_name LIKE '{esc(like)}'")
        if include:
            quoted = ", ".join(f"'{esc(t)}'" for t in include)
            ors.append(f"table_name IN ({quoted})")
        if ors:
            preds.append("(" + " OR ".join(ors) + ")")
        where = " AND ".join(preds)
        return (
            "(SELECT table_name FROM information_schema.tables "
            f"WHERE {where}) AS catalog_tables"
        )


# --- embedded-Derby integration (the testable JDBC deployment) -------------


def derby_source(dbdir: str) -> JdbcSource:
    """A ``JdbcSource`` over an embedded Derby database directory."""
    return JdbcSource(
        url=f"jdbc:derby:{dbdir}",
        user="app",
        password="",
        num_partitions=8,
        extra={"driver": DERBY_DRIVER},
    )


def derby_create_nation(spark: SparkSession, sf_dir: str) -> str:
    """Create a Derby database holding the ``nation`` table (DDL through raw
    JDBC, rows appended through Spark's JDBC writer).  Returns the db dir.

    Explicit DDL rather than Spark's auto-create: Derby's dialect maps
    StringType to CLOB, which blocks predicate pushdown on the name column —
    the same reason a production pipeline pins its DDL.
    """
    from ..catalog import load

    dbdir = os.path.join(tmp_dir("derby_"), "db")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{dbdir};create=true")
    try:
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE nation (n_nationkey INT, n_name VARCHAR(64), n_regionkey INT)"
        )
        st.close()
    finally:
        conn.close()
    load(spark, sf_dir, "nation").write.format("jdbc").option(
        "url", f"jdbc:derby:{dbdir}"
    ).option("dbtable", "nation").option("driver", DERBY_DRIVER).mode("append").save()
    return dbdir


@register(
    "src_jdbc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    doc="The reference's core path — a real database table scanned through "
    "JDBC (app/cloud-sql-query-runner/main.py:37-57) — against embedded "
    "Derby: parquet→JDBC write, then a PARTITIONED range read (8 range "
    "predicates on n_nationkey, the parallel analog of the reference's "
    "serial Cloud SQL export).  Oracle compares the round-tripped rows to "
    "the parquet source of truth.",
)
def src_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    dbdir = derby_create_nation(spark, sf_dir)
    df = derby_source(dbdir).read(
        spark, "nation", partition_column="n_nationkey", lower_bound=0, upper_bound=25
    )
    # Derby uppercases unquoted identifiers; realign with the catalog schema
    return df.select(
        F.col("N_NATIONKEY").alias("n_nationkey"),
        F.col("N_NAME").alias("n_name"),
        F.col("N_REGIONKEY").alias("n_regionkey"),
    )
