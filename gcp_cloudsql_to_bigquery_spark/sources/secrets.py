"""Secret/credential resolution for sources (SURVEY.md §2A #27).

The reference fetches database credentials from GCP Secret Manager at
startup (``/root/reference/app/cloud-sql-query-runner/get_secret.py:8-14``:
``client.access_secret_version(name).payload.data``).  The Spark-native
analog is *injection*, not an API client: the cluster launcher (or the
platform's own Secret Manager integration) places the secret into Spark
conf or the driver environment, and code resolves it by NAME at use time —
secrets never live in code or in the job's arguments.

Resolution order (first hit wins):

1. ``spark.conf``:  ``spark.secrets.<name>``   — per-session injection,
   what ``spark-submit --conf`` / cluster secret-scopes populate;
2. environment:     ``<NAME>`` uppercased, ``.``/``-`` → ``_`` — what
   container orchestrators mount;
3. the caller's ``default`` (pass ``default=""`` for optional secrets).

Missing secrets fail LOUDLY with the resolution chain in the message —
the reference's behavior (Secret Manager raises on a missing version),
not a silent empty string.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CONF_PREFIX = "spark.secrets."


class SecretNotFound(KeyError):
    """Raised when no link of the resolution chain yields a value."""


def _env_name(name: str) -> str:
    return name.upper().replace(".", "_").replace("-", "_")


def resolve_secret(spark: SparkSession, name: str, default: str | None = None) -> str:
    """Resolve secret ``name`` via spark.conf → environment → default."""
    import os

    val = spark.conf.get(CONF_PREFIX + name, None)
    if val is not None:
        return val
    val = os.environ.get(_env_name(name))
    if val is not None:
        return val
    if default is not None:
        return default
    raise SecretNotFound(
        f"secret {name!r} not found: checked spark.conf[{CONF_PREFIX + name!r}], "
        f"env[{_env_name(name)!r}], and no default was given"
    )


def jdbc_source_from_conf(spark: SparkSession, prefix: str = "db"):
    """Build a :class:`~.jdbc.JdbcSource` entirely from injected secrets.

    Reads ``<prefix>.url`` / ``<prefix>.user`` / ``<prefix>.password`` (the
    password defaulting to empty only if ``<prefix>.password_optional`` conf
    is set is deliberately NOT offered — a missing password is a config
    error).  This is the deployment wiring for ``JdbcSource`` at
    ``jdbc:mysql://host:3306/db``: nothing secret appears in code, and
    rotating credentials is a conf change, not a redeploy.
    """
    from .jdbc import JdbcSource

    return JdbcSource(
        url=resolve_secret(spark, f"{prefix}.url"),
        user=resolve_secret(spark, f"{prefix}.user"),
        password=resolve_secret(spark, f"{prefix}.password"),
    )
