"""JDBC source: the Spark-native replacement for the reference's Cloud SQL
export path (SURVEY.md §2A #1/#4/#5; entry point 2 lifecycle §3).

The reference moves tables by asking the Cloud SQL Admin API to dump
``SELECT *`` to CSV and polling (``/root/reference/app/cloud-sql-exporter/
export_table.py:5-34``).  Spark replaces the whole dance with a partitioned
JDBC scan: executors read key ranges in parallel, no 540 s wall limit, no
batch requeue, retries built in.

No database ships in this container, so these builders are exercised
structurally (option assembly, partitioning math) in tests/test_sources.py;
the read call itself is the one-line ``.load()`` on a real deployment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


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
