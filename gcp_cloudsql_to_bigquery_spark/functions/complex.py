"""Complex-type and user-defined function surface: explode/posexplode,
map construction/access, struct nesting, unpivot (stack), Python UDTF,
Pandas grouped-agg UDAF, applyInPandas grouped-map.

Completes SURVEY.md §2B rows "Array/map/JSON fns" and "UDF/UDAF/UDTF".
The UDF examples exist to prove the surfaces with deterministic kernels;
everything that *can* stay JVM-side does (the reference's only scalar
'UDF', the type mapper, is pure metadata here — ingest/types.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import register


@register(
    "fn_explode_posexplode",
    oracle="""
    SELECT doc_id, i - 1 AS pos, toks[i] AS tok
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
          WHERE doc_id < 50),
         LATERAL unnest(range(1, len(toks) + 1)) AS u(i)
    """,
    doc="posexplode: one row per (doc, position, token) — the tokenizer "
    "fan-out every text pipeline starts with (generator, no shuffle).",
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok")
    )


@register(
    "fn_map_functions",
    oracle="""
    SELECT event_id,
           CAST(map_keys(m)[1] AS VARCHAR)     AS first_key,
           CAST(map_values(m)[1] AS BIGINT)    AS k_value,
           CAST(element_at(m, 'k')[1] AS BIGINT) AS lookup_k,
           cardinality(m)                      AS n_entries
    FROM (SELECT event_id,
                 MAP(['k', 'etype_len'],
                     [CASE WHEN json_valid(props)
                           THEN TRY_CAST(json_extract_string(props, '$.k')
                                         AS BIGINT) END,
                      CAST(length(event_type) AS BIGINT)]) AS m
          FROM events WHERE event_id < 200)
    """,
    doc="Map construction + access: create_map / map_keys / map_values / "
    "element_at / size over JSON-extracted values.",
)
def fn_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("bigint"),
        F.lit("etype_len"),
        F.length("event_type").cast("bigint"),
    )
    return e.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        F.map_values(m).getItem(0).alias("k_value"),
        F.element_at(m, F.lit("k")).alias("lookup_k"),
        F.size(m).alias("n_entries"),
    )


@register(
    "fn_struct_nesting",
    oracle="""
    SELECT o_orderkey,
           info.who.cust       AS who_cust,
           info.who.status     AS who_status,
           info.amount         AS amount
    FROM (
      SELECT o_orderkey,
             {'who': {'cust': o_custkey, 'status': o_orderstatus},
              'amount': round(o_totalprice, 2)} AS info
      FROM orders WHERE o_orderkey <= 300
    )
    """,
    doc="Nested struct construction then field re-extraction through two "
    "levels (what a multimodal metadata column looks like structurally); "
    "flat output so the oracle compares values, not struct encodings.",
)
def fn_struct_nesting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    info = F.struct(
        F.struct(
            F.col("o_custkey").alias("cust"), F.col("o_orderstatus").alias("status")
        ).alias("who"),
        F.round("o_totalprice", 2).alias("amount"),
    )
    return (
        o.select("o_orderkey", info.alias("info"))
        .select(
            "o_orderkey",
            F.col("info.who.cust").alias("who_cust"),
            F.col("info.who.status").alias("who_status"),
            F.col("info.amount").alias("amount"),
        )
    )


@register(
    "fn_unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT c_custkey, round(c_acctbal, 2) AS bal,
             CAST(c_nationkey AS DOUBLE) AS nat
      FROM customer WHERE c_custkey <= 100
    ) UNPIVOT (val FOR metric IN (bal, nat))
    """,
    doc="Unpivot via stack(): wide→long metric reshape (generator, no "
    "shuffle).  SQL-standard UNPIVOT semantics: NULL cells produce NO "
    "output row (Spark's stack() keeps them; the explicit filter states "
    "the standard's EXCLUDE NULLS default, which DuckDB's UNPIVOT "
    "applies unconditionally — null-tier find).",
)
def fn_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return (
        c.select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_nationkey").cast("double").alias("nat"),
        )
        .select(
            "c_custkey",
            F.expr("stack(2, 'bal', bal, 'nat', nat) AS (metric, val)"),
        )
        .filter(F.col("val").isNotNull())
    )


@register(
    "fn_array_advanced",
    oracle="""
    SELECT vec_id,
           round(CAST(e2[3] AS DOUBLE), 6)                    AS third,
           list_position(sorted_idx, 1)                       AS pos_of_one,
           -- DuckDB's flatten DROPS null sublists (len 0) where Spark
           -- propagates NULL — state SQL-standard null propagation
           CASE WHEN e2 IS NULL THEN NULL ELSE len(flat) END  AS flat_len,
           round(CAST(list_sum(sliced) AS DOUBLE), 4)         AS slice_sum
    FROM (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS e2,
             list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(CASE WHEN x >= 0 THEN 1 ELSE 0 END AS BIGINT)) AS sorted_idx,
             flatten([CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])]) AS flat,
             CAST(embedding AS DOUBLE[])[1:8] AS sliced
      FROM embeddings WHERE vec_id < 50
    )
    """,
    doc="Advanced array ops: element access, array_position, flatten, slice "
    "+ fold — the vector-column manipulation toolkit.",
)
def fn_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load as _load

    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding").cast("array<double>")
    signs = F.transform(emb, lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"))
    return e.select(
        "vec_id",
        F.round(F.element_at(emb, 3), 6).alias("third"),
        F.array_position(signs, 1).alias("pos_of_one"),
        F.size(F.flatten(F.array(emb, emb))).alias("flat_len"),
        F.round(
            F.aggregate(F.slice(emb, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("slice_sum"),
    )


@register(
    "fn_python_udtf",
    oracle="""
    SELECT doc_id, CAST(n - 1 AS BIGINT) AS chunk_no,
           substr(text, (n - 1) * 200 + 1, 200) AS chunk
    FROM documents, LATERAL unnest(range(1, CAST(ceil(length(text) / 200.0) AS BIGINT) + 1)) AS t(n)
    WHERE doc_id < 50
    """,
    doc="Python UDTF (Spark 3.5+ table function): fixed-width document "
    "chunker — one input row → N chunk rows, the pretraining tokenization "
    "fan-out shape. Lateral-join equivalent in the oracle.",
)
def fn_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no bigint, chunk string")
    class Chunker:
        def eval(self, text: str, width: int):
            if text is None:
                return
            for i in range(0, len(text), width):
                yield i // width, text[i : i + width]

    spark.udtf.register("chunker", Chunker)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.chunk
        FROM documents d, LATERAL chunker(d.text, 200) c
        WHERE d.doc_id < 50
        """
    )


@register(
    "sql_cte_window",
    oracle="""
    WITH seg_spend AS (
      SELECT c_mktsegment AS seg, c_custkey, round(sum(o_totalprice), 2) AS spend
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment, c_custkey
    ),
    ranked AS (
      SELECT seg, c_custkey, spend,
             rank() OVER (PARTITION BY seg ORDER BY spend DESC, c_custkey) AS rnk
      FROM seg_spend
    )
    SELECT seg, c_custkey, spend, rnk FROM ranked WHERE rnk <= 5
    """,
    doc="Pure Spark-SQL form (WITH … CTEs + window) — Catalyst produces the "
    "same plan as the DataFrame API; top-5 spenders per segment.",
)
def sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH seg_spend AS (
          SELECT c_mktsegment AS seg, c_custkey, round(sum(o_totalprice), 2) AS spend
          FROM customer JOIN orders ON o_custkey = c_custkey
          GROUP BY c_mktsegment, c_custkey
        ),
        ranked AS (
          SELECT seg, c_custkey, spend,
                 rank() OVER (PARTITION BY seg ORDER BY spend DESC, c_custkey) AS rnk
          FROM seg_spend
        )
        SELECT seg, c_custkey, spend, rnk FROM ranked WHERE rnk <= 5
        """
    )


@register(
    "fn_map_higher_order",
    oracle="""
    SELECT event_id,
           CAST(map_entries(m2)[1].value AS BIGINT) AS k_doubled,
           CAST(cardinality(m2) AS INT)             AS n_after_filter
    FROM (
      SELECT event_id,
             map_from_entries(
               list_transform(
                 list_filter(map_entries(m), e -> e.value > 10),
                 e -> {'key': e.key, 'value': e.value * 2})) AS m2
      FROM (SELECT event_id,
                   MAP(['k'], [CASE WHEN json_valid(props)
                                    THEN TRY_CAST(json_extract_string(props, '$.k')
                                                  AS BIGINT) END]) AS m
            FROM events WHERE event_id < 300)
    )
    """,
    doc="Map higher-order functions: map_filter + transform_values "
    "(entries round-trip in the oracle) — typed-metadata manipulation for "
    "multimodal columns.",
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("bigint"))
    m2 = F.transform_values(
        F.map_filter(m, lambda _k, v: v > 10), lambda _k, v: v * 2
    )
    return e.select(
        "event_id",
        F.element_at(F.map_values(m2), 1).alias("k_doubled"),
        F.size(m2).alias("n_after_filter"),
    )


@register(
    "fn_pandas_udaf_geomean",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 4) AS geo_mean
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pandas grouped-agg UDAF (Arrow-batched): geometric mean of order "
    "value per priority; oracle is the exp∘avg∘ln identity.",
)
def fn_pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def geo_mean(v: pd.Series) -> float:
        # aggregate-skip: Spark hands NULL cells to the UDAF as NaN, which
        # would poison the whole group's mean; SQL's avg(ln(x)) skips them
        vals = v.to_numpy()
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            # SQL avg over zero non-null rows is NULL, not NaN (ADVICE r12)
            return None
        return float(np.exp(np.log(vals).mean()))

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(geo_mean("o_totalprice"), 4).alias("geo_mean")
    )


@register(
    "fn_grouped_map_zscore",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
    FROM customer
    """,
    doc="applyInPandas grouped-map: per-segment z-score normalization "
    "(numpy per group); oracle is the window-function identity. The "
    "feature-normalization shape of an ML data pipeline.",
)
def fn_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["c_acctbal"]
        sd = v.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": ((v - v.mean()) / sd).round(4),
            }
        )

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, z double"
    )


@register(
    "fn_json_variant",
    oracle="""
    WITH safe AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.missing')
             END AS m
      FROM events
      WHERE event_id < 2000
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k,
           count(CASE WHEN m IS NULL THEN 1 END) AS n_missing
    FROM safe
    GROUP BY event_type
    """,
    doc="VARIANT semi-structured JSON (Spark 4 native type): try_parse_json "
    "shreds each props payload ONCE into the binary variant encoding "
    "(NULL, not an error, for malformed payloads — a 100 TB event feed "
    "always contains some); try_variant_get then does typed path access "
    "with no re-parse, returning NULL for absent paths AND for values the "
    "target type cannot hold (objects under $.k).  The oracle mirrors "
    "both: json_valid gate + TRY_CAST.  The "
    "extracted values feed a regular group-aggregate.  At 100 TB this is "
    "the schema-on-read path for heterogeneous event payloads: one parse "
    "per row instead of one string-parse per get_json_object call (fn_json "
    "is the string-path comparison), binary-encoded fields skip-scan "
    "cheaply, and the parse stays inside whole-stage codegen.",
)
def fn_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .withColumn("v", F.try_parse_json("props"))
    )
    k = F.try_variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.missing", "string")
    return (
        e.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("m").isNull(), 1)).alias("n_missing"),
        )
    )


_RECURSIVE_BOM_SQL = """
WITH RECURSIVE walk AS (
  SELECT p_partkey AS part, p_partkey AS node, CAST(0 AS BIGINT) AS depth
  FROM part
  UNION ALL
  SELECT part, CAST(floor(node / 10.0) AS BIGINT) AS node, depth + 1
  FROM walk WHERE node > 0
)
SELECT depth, count(*) AS n_parts, min(part) AS min_part, max(part) AS max_part
FROM walk
GROUP BY depth
"""


@register(
    "sql_recursive_cte",
    oracle=_RECURSIVE_BOM_SQL,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): walk a 10-ary ancestor "
    "hierarchy derived from p_partkey (node -> floor(node/10) until the "
    "root) and roll up the reachable set per depth — the bill-of-materials "
    "/ org-chart / bounded-graph-reachability shape, IDENTICAL SQL text on "
    "both engines.  Execution model at scale: each recursion level is one "
    "distributed job over the previous level's output (the declarative "
    "form of the iterative min-label loop in dedup_connected_components), "
    "so total cost is depth x level-size, and level size here shrinks 10x "
    "per step.  Depth is bounded by the key domain (~4 levels), far under "
    "Spark's recursion guard.",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_RECURSIVE_BOM_SQL)


@register(
    "embedding_normalize_arrow",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2_norm,
           round(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                x -> x * x))), 6) AS unit_first
    FROM embeddings
    """,
    doc="mapInArrow vectorized kernel: L2-normalize the embedding column "
    "working directly on Arrow record batches — the flat list-values "
    "buffer reshapes zero-copy into an (n, 64) numpy view, one GEMM-free "
    "vector op per batch, no pandas materialization.  This is the lowest-"
    "overhead Python hot path (mapInPandas adds a pandas conversion per "
    "batch; row-at-a-time UDFs are 10-100x worse) and the right shape for "
    "numeric embedding kernels at 100 TB: per-partition streaming batches, "
    "constant memory, no shuffle.  Oracle recomputes the norm with DuckDB "
    "list folds; both sides round to 6 dp to absorb summation-order noise.",
)
def embedding_normalize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def kernel(batches):
        import math

        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            emb = b.column(1)
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            null = np.asarray(emb.is_null())
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            lens = offs[1:] - offs[:-1]
            elem_null = emb.values.is_null().to_numpy(zero_copy_only=False)
            # exact per-row NULL-element counts via prefix sums — the
            # round-15 sibling audit of the PQ kernel's clamped-reduceat
            # bug class (ADVICE r14 medium): this kernel's old fast path
            # never checked ELEMENT validity at all, so a NULL element
            # flowed through flatten() as NaN and both outputs went NaN
            # where the oracle's list_sum SKIPS null elements (and its
            # all-NULL/empty sum is NULL); the old slow path's
            # np.asarray(list-with-None) did the same.  Witnessed in
            # tests/test_round15.py against DuckDB on exactly that
            # geometry (no hostile tier plants element-level nulls).
            if len(elem_null):
                csum = np.concatenate(
                    ([0], np.cumsum(elem_null, dtype=np.int64))
                )
                n_bad = csum[offs[1:]] - csum[offs[:-1]]
            else:
                n_bad = np.zeros(b.num_rows, dtype=np.int64)
            if (
                not null.any()
                and not n_bad.any()
                and lens.min() == lens.max()
                and lens[0] > 0
            ):
                # fast path: rectangular, fully-valid batch.  .flatten()
                # honors slice offsets; .values on a sliced ListArray
                # would return the whole child buffer
                flat = np.asarray(emb.flatten(), dtype=np.float64)
                mat = flat.reshape(b.num_rows, -1)
                norms = np.sqrt((mat * mat).sum(axis=1))
                firsts = mat[:, 0]
                norm_null = np.zeros(b.num_rows, dtype=bool)
                first_null = norm_null
            else:
                # exact row path (the PQ-kernel scalar-path philosophy):
                # SQL list_sum skips NULL elements and is NULL for empty
                # or all-NULL lists; the unit numerator is the ORIGINAL
                # first element (positionally NULL-able)
                rows = emb.to_pylist()
                norms = np.zeros(b.num_rows)
                firsts = np.zeros(b.num_rows)
                norm_null = np.zeros(b.num_rows, dtype=bool)
                first_null = np.zeros(b.num_rows, dtype=bool)
                for i, r in enumerate(rows):
                    if r is None:
                        norm_null[i] = True
                        first_null[i] = True
                        continue
                    vals = [x for x in r if x is not None]
                    if vals:
                        norms[i] = math.sqrt(sum(x * x for x in vals))
                    else:
                        norm_null[i] = True
                    if r and r[0] is not None:
                        firsts[i] = r[0]
                    else:
                        first_null[i] = True
            # zero-norm vectors cannot be normalized: unit_first is NULL
            # (masked), matching the oracle's x/0 -> NULL — NOT numpy's NaN
            zero = (norms == 0) & ~norm_null
            unit_null = norm_null | first_null | zero
            unit = np.divide(
                firsts, norms, out=np.zeros_like(norms), where=~unit_null
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pa.array(np.round(norms, 6), mask=norm_null),
                    pa.array(np.round(unit, 6), mask=unit_null),
                ],
                names=["vec_id", "l2_norm", "unit_first"],
            )

    return e.mapInArrow(kernel, schema="vec_id long, l2_norm double, unit_first double")


_LISTAGG_SQL = """
SELECT s_nationkey,
       count(*) AS n_supp,
       listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name) AS supplier_roster
FROM supplier
GROUP BY s_nationkey
"""


@register(
    "fn_listagg",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_supp,
           string_agg(s_name, '|' ORDER BY s_name) AS supplier_roster
    FROM supplier
    GROUP BY s_nationkey
    """,
    doc="SQL-standard ordered string aggregation (Spark 4.0 listagg WITHIN "
    "GROUP): per-nation supplier roster in deterministic name order — the "
    "ordering clause is what makes a string aggregate reproducible across "
    "partitionings (an unordered listagg/collect_list concat is "
    "run-dependent at any scale).  Complements elt_table_list_fold, which "
    "builds the same shape from primitives (concat_ws . sort . "
    "collect_list).",
)
def fn_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_LISTAGG_SQL)


@register(
    "fn_array_higher_order",
    oracle="""
    SELECT vec_id,
           len(list_filter(e2, x -> x > 0))                         AS n_pos,
           list_aggregate(list_transform(e2, x -> CAST(x > 1.5 AS BOOLEAN)),
                          'bool_or')                                AS any_big,
           list_aggregate(list_transform(e2, x -> CAST(abs(x) < 10 AS BOOLEAN)),
                          'bool_and')                               AS all_small,
           round(CAST(list_sum(list_sort(e2, 'DESC')[1:3]) AS DOUBLE), 4)
                                                                    AS top3_sum
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e2 FROM embeddings)
    """,
    doc="Higher-order array functions over the embedding column: filter "
    "(positive-component count), exists / forall (predicate folds), and "
    "sort_array + slice + aggregate (top-3 component sum) — the lambda "
    "family that keeps vector predicates JVM-side in whole-stage codegen "
    "instead of falling back to Python.  Completes the higher-order "
    "surface next to fn_map_higher_order (maps) and fn_array_advanced "
    "(transform/fold).",
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.exists(emb, lambda x: x > 1.5).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x) < 10).alias("all_small"),
        F.round(
            F.aggregate(
                F.slice(F.sort_array(emb, asc=False), 1, 3),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("top3_sum"),
    )


@register(
    "fn_udtf_table_argument",
    oracle="""
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Polymorphic table function: a Python UDTF taking a TABLE argument "
    "with PARTITION BY (Spark 3.5+) — the engine shuffles documents by "
    "lang, streams each partition's rows through eval(), and terminate() "
    "emits one summary row per partition.  This is the escape hatch for "
    "per-group algorithms that aren't expressible as aggregates (state "
    "machines, sequence models) while keeping the partitioning contract "
    "declarative; here the kernel is a simple count/sum so the batch "
    "GROUP BY is an exact oracle.  Same shuffle shape as applyInPandas, "
    "but addressable from pure SQL.",
)
def fn_udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n bigint, total_chars bigint")
    class LangStats:
        def __init__(self) -> None:
            self.lang, self.n, self.chars = None, 0, 0
            # empty-partition guard must be a SEPARATE flag: guarding on
            # `lang is not None` would silently drop the NULL-lang GROUP,
            # which SQL's GROUP BY keeps (null-tier find)
            self.seen = False

        def eval(self, row) -> None:
            self.lang = row["lang"]
            self.seen = True
            self.n += 1
            self.chars += int(row["n_chars"])

        def terminate(self):
            if self.seen:
                yield self.lang, self.n, self.chars

    spark.udtf.register("lang_stats", LangStats)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("SELECT * FROM lang_stats(TABLE(documents) PARTITION BY lang)")


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    HAVING count(*) > 100
    """,
    doc="SQL pipe syntax (Spark 4 / GoogleSQL style): FROM ... |> WHERE "
    "... |> AGGREGATE ... |> WHERE — each operator applies top-to-bottom "
    "in reading order instead of SQL's inside-out clause nesting.  "
    "Purely surface syntax: Catalyst resolves it to the identical "
    "logical plan as the classic form, which is exactly what the oracle "
    "states (same scan pushdown, same partial-agg shuffle).",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |> AGGREGATE count(*) AS n, round(sum(l_extendedprice), 2) AS rev
           GROUP BY l_returnflag
        |> WHERE n > 100
        """
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY ALL
    """,
    doc="GROUP BY ALL (every non-aggregate select item becomes a grouping "
    "key — the modern-warehouse convenience DuckDB and Spark 4 share, so "
    "the oracle is the LITERAL same text).  Resolution happens at analysis "
    "time; the physical plan is the ordinary partial-agg hash aggregate.",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(avg(l_discount), 6) AS avg_disc
        FROM lineitem
        GROUP BY ALL
        """
    )


@register(
    "fn_generators_posexplode_outer",
    oracle="""
    WITH s AS (SELECT s_suppkey, s_nationkey, s_acctbal, s_name
               FROM supplier WHERE s_suppkey <= 400)
    SELECT s_suppkey, CAST(0 AS INT) AS pos, 'acctbal_cents' AS metric,
           CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS val
    FROM s WHERE s_nationkey >= 5
    UNION ALL
    SELECT s_suppkey, 1, 'nationkey', CAST(s_nationkey AS BIGINT)
    FROM s WHERE s_nationkey >= 5
    UNION ALL
    SELECT s_suppkey, 2, 'name_len', CAST(length(s_name) AS BIGINT)
    FROM s WHERE s_nationkey >= 5
    UNION ALL
    SELECT s_suppkey, NULL, NULL, NULL
    -- the impl's when/otherwise routes a NULL gate into the EMPTY array
    -- (CASE-else semantics), so a NULL nationkey keeps its stub row
    FROM s WHERE s_nationkey < 5 OR s_nationkey IS NULL
    """,
    doc="Generator functions: posexplode_outer over a per-row "
    "array<struct> (built inline from columns) pivots each supplier into "
    "ordered (pos, metric, value) rows — the EAV unpivot generators "
    "express natively; the _outer variant KEEPS rows whose array is "
    "empty (here: nationkey < 5) as a single all-NULL generator row, "
    "exactly like LEFT JOIN LATERAL, where plain posexplode would drop "
    "the supplier entirely.  The oracle states the row-for-row "
    "expansion, NULL stub rows included.  Generate is a narrow operator "
    "— rows fan out within the partition, no shuffle.",
)
def fn_generators_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 400)
    metrics = F.array(
        F.struct(
            F.lit("acctbal_cents").alias("metric"),
            F.floor(F.col("s_acctbal") * 100 + 0.5).cast("bigint").alias("val"),
        ),
        F.struct(
            F.lit("nationkey").alias("metric"),
            F.col("s_nationkey").cast("bigint").alias("val"),
        ),
        F.struct(
            F.lit("name_len").alias("metric"),
            F.length("s_name").cast("bigint").alias("val"),
        ),
    )
    gated = F.when(F.col("s_nationkey") >= 5, metrics).otherwise(
        F.array().cast("array<struct<metric:string,val:bigint>>")
    )
    return s.select(
        "s_suppkey", F.posexplode_outer(gated).alias("pos", "m")
    ).select("s_suppkey", "pos", F.col("m.metric").alias("metric"), F.col("m.val").alias("val"))


@register(
    "fn_pandas_udf_iter",
    oracle="""
    WITH tok AS (
      -- the relational replay correlates tokens back BY doc_id; an
      -- id-less doc cannot be keyed (null-KEYS contract, both sides)
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents WHERE doc_id IS NOT NULL
    ),
    scored AS (
      SELECT doc_id,
             (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64) AS b
      FROM tok WHERE w <> ''
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE CAST(count(s.b) AS BIGINT) END AS n_toks,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE CAST(coalesce(sum((s.b * 2654435761 % 1000) - 500), 0)
                          AS BIGINT) END AS score
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    WHERE d.doc_id IS NOT NULL
    GROUP BY d.doc_id, d.text
    """,
    doc="Iterator-form scalar Pandas UDF (Iterator[pd.Series] -> "
    "Iterator[pd.Series]) — the ML-inference pattern: the 'model' (a "
    "64-entry hashed-feature weight table) is constructed ONCE per "
    "worker before the batch loop, then reused across every Arrow batch "
    "— exactly how a real tokenizer/ONNX/torch model amortizes its load "
    "cost over a partition, which the plain one-call-per-batch scalar "
    "UDF cannot express.  The kernel scores each document as the sum "
    "of md5-hashed unigram bucket weights (deterministic Knuth-"
    "multiplicative weights, pure integers), and the oracle replays the "
    "identical arithmetic relationally (LEFT JOIN from documents so a "
    "doc with ZERO non-empty tokens keeps its (0, 0) row — the inner "
    "GROUP BY silently dropped empty docs; hostile-data find).  Scale: "
    "narrow per-row transform, zero shuffle, one model build per worker.",
)
def fn_pandas_udf_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    @F.pandas_udf("long")
    def score_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # model load: once per worker, amortized over all Arrow batches
        weights = [(b * 2654435761 % 1000) - 500 for b in range(64)]

        def score_doc(text: str) -> int:
            if text is None:  # NULL text is unscorable: NULL out, NULL in
                return None
            total = 0
            for w in text.lower().split(" "):
                if w:
                    b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
                    total += weights[b]
            return total

        for batch in batches:
            yield batch.map(score_doc)

    # NULL doc_id excluded — the oracle's token join is id-keyed
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    toks = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        score_iter(F.col("text")).alias("score"),
    )


@register(
    "fn_xpath_extract",
    oracle="""
    WITH x AS (
      SELECT n_nationkey,
             '<nation><name>' || n_name || '</name><region id="'
               || CAST(n_regionkey AS VARCHAR) || '"/><pop>'
               || CAST(n_nationkey * 1000 + 17 AS VARCHAR)
               || '</pop></nation>' AS doc
      FROM nation
    )
    SELECT n_nationkey,
           regexp_extract(doc, '<name>([^<]*)</name>', 1)      AS name,
           CAST(regexp_extract(doc, 'id="([0-9]+)"', 1) AS BIGINT) AS region_id,
           CAST(regexp_extract(doc, '<pop>([0-9]+)</pop>', 1) AS BIGINT) AS pop
    FROM x
    """,
    doc="XPath extraction functions (xpath_string / xpath_long) over "
    "inline XML — the semi-structured column case the XML SOURCE "
    "(src_xml_roundtrip) doesn't cover: XML arriving INSIDE a string "
    "column of an otherwise relational feed (SOAP payloads, config "
    "blobs), queried without a parse-to-table pass.  Spark evaluates "
    "real XPath (attribute axes included: //region/@id); the oracle "
    "reconstructs the same fields with anchored regexes, valid because "
    "the fixture XML is canonical (no namespaces/CDATA — where real "
    "XPath and regex would diverge, which is exactly why the engine "
    "side uses XPath).  Narrow per-row codegen expressions.",
)
def fn_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    doc = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit('</name><region id="'),
        F.col("n_regionkey").cast("string"),
        F.lit('"/><pop>'),
        (F.col("n_nationkey") * 1000 + 17).cast("string"),
        F.lit("</pop></nation>"),
    )
    x = n.select("n_nationkey", doc.alias("doc"))
    return x.select(
        "n_nationkey",
        F.xpath_string("doc", F.lit("/nation/name")).alias("name"),
        F.xpath_long("doc", F.lit("string(//region/@id)")).alias("region_id"),
        F.xpath_long("doc", F.lit("/nation/pop")).alias("pop"),
    )


@register(
    "fn_pandas_on_spark_api",
    oracle="""
    SELECT o_orderpriority AS pri,
           -- count(col), not count(*): the pandas dialect's .count() counts
           -- NON-NULL cells — that IS its documented semantic (null-tier find).
           -- Likewise groupby() DROPS the NULL key (dropna=True default,
           -- null-KEYS find) — the WHERE below states it
           CAST(count(o_totalprice) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY pri
    """,
    doc="PANDAS-ON-SPARK API surface (pyspark.pandas): the same grouped "
    "aggregate expressed through the pandas dialect — "
    "df.pandas_api().groupby(...).agg(...) — and handed straight back "
    "to Spark SQL via to_spark(), proving the dialect compiles onto "
    "the identical distributed plan (Catalyst sees one partial-agg "
    "groupBy; nothing materializes on the driver, unlike toPandas).  "
    "This is the migration surface for pandas codebases: the query "
    "body is pandas idiom, the execution and the oracle check are the "
    "engine's.  Integer cents before the agg keep the sums exact.  "
    "Scale: identical plan to the native form — the API is sugar, and "
    "this query is the witness.",
)
def fn_pandas_on_spark_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    psdf = o.pandas_api()
    g = psdf.groupby("pri")["cents"]
    agg = g.sum().to_frame("cents")
    agg["n"] = g.count()
    agg["max_cents"] = g.max()
    out = agg.reset_index().to_spark()
    return out.select(
        "pri",
        F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
    )
