"""Round-7-session operator wave: lake branch / write-audit-publish
roundtrip with a SQL-checkable end state.

Snapshot branches and WAP were tests-only in round 6; their observable
END STATE is pure SQL over the input tables, so this wave gives them a
driver-gradeable oracle: the query performs the REAL lake lifecycle
(write v1 to main -> isolated branch write -> fast-forward -> WAP a good
batch that publishes -> WAP a bad batch that must raise and must NOT
reach main) and returns main's final read-back plus the state flags; the
oracle recomputes the expected final frame analytically (base + branch +
good batches, the bad batch absent) and pins the version pointer, the
isolation row count, and the quarantined staging count as constants.
Reference parity: the reference's Firehose error routing ships bad
records to an error prefix (README.md:41-47); WAP is the lake-side
equivalent where audited-bad data never reaches published readers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import _SCRATCH
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


@register(
    "lake_branch_wap_roundtrip",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey <= 5000),
        final AS (
            SELECT * FROM o WHERE o_orderkey % 4 IN (0, 1, 2)),
        main_rows AS (
            SELECT 'main' AS kind, o_orderstatus AS k, COUNT(*) AS n,
                   {sql_dsum("o_totalprice")} AS val
            FROM final GROUP BY 2),
        state_rows AS (
            SELECT 'state' AS kind, 'main_version' AS k,
                   CAST(3 AS BIGINT) AS n, 3.0 AS val
            UNION ALL
            SELECT 'state', 'isolation_main_rows',
                   (SELECT COUNT(*) FROM o WHERE o_orderkey % 4 = 0), 1.0
            UNION ALL
            SELECT 'state', 'wap_bad_staged',
                   (SELECT COUNT(*) FROM o WHERE o_orderkey % 4 = 3), 1.0)
        SELECT kind, k, n, val FROM main_rows
        UNION ALL SELECT kind, k, n, val FROM state_rows
        ORDER BY kind, k
    """,
    tags=("B1", "B10", "data-mgmt", "lake"),
    doc="Snapshot branches + write-audit-publish, end-state-checked: "
    "write base to main (v1); write a batch to an isolated branch (v2) "
    "while main still reads v1 (isolation pinned as a row); fast-forward "
    "main to v2; WAP a good batch (publishes v3); WAP a batch violating "
    "its in_range constraint (must raise AuditFailure, stays staged on "
    "the audit branch, never reaches main). The result is main's final "
    "group-by read-back plus state rows for the main version pointer, "
    "the isolation count, and the quarantined staging count — so a WAP "
    "that leaks bad data or a fast-forward that moves the wrong pointer "
    "flips the hash. Iceberg WAP semantics per pkg/lake.py:1032; "
    "reference parity: error routing away from published data "
    "(reference README.md:41-47).",
)
def lake_branch_wap_roundtrip(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
        AuditFailure,
        create_branch,
        fast_forward,
        latest_snapshot_version,
        read_branch,
        read_snapshot,
        write_audit_publish,
        write_snapshot,
        write_snapshot_to_branch,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.constraints import (
        in_range,
    )

    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    batch = F.col("o_orderkey") % 4
    root = os.path.join(_SCRATCH, "w8_branch_wap")
    shutil.rmtree(root, ignore_errors=True)

    # v1: base batch straight to main
    write_snapshot(o.where(batch == 0), root)
    # v2 on an isolated branch: main must still read v1 while it exists
    create_branch(root, "dev")
    write_snapshot_to_branch(
        read_branch(spark, root, "dev").unionByName(o.where(batch == 1)),
        root,
        "dev",
    )
    isolation_main_rows = read_snapshot(spark, root).count()  # still v1
    fast_forward(root, "dev")  # main -> v2 (ancestry-checked pointer move)
    # v3: WAP a good batch — audits the staged bytes, then publishes
    gate = [in_range("o_totalprice", 0.0, 1e12)]
    write_audit_publish(
        read_snapshot(spark, root).unionByName(o.where(batch == 2)), root, gate
    )
    # WAP a bad batch (negated prices violate the gate): must raise and
    # must leave main untouched; the staged version stays on its audit
    # branch for inspection
    bad = o.where(batch == 3).withColumn(
        "o_totalprice", -F.abs(F.col("o_totalprice"))
    )
    wap_bad_raised = 0
    try:
        write_audit_publish(
            read_snapshot(spark, root).unionByName(bad),
            root,
            gate,
            audit_branch="audit_bad",
        )
    except AuditFailure:
        wap_bad_raised = 1
    staged_bad = (
        read_branch(spark, root, "audit_bad")
        .where(F.col("o_totalprice") < 0)
        .count()
    )
    main_version = latest_snapshot_version(root)

    main_rows = (
        read_snapshot(spark, root)
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("val"))
        .select(F.lit("main").alias("kind"), "k", "n", "val")
    )
    state_rows = spark.createDataFrame(
        [
            ("state", "main_version", main_version, float(main_version)),
            ("state", "isolation_main_rows", isolation_main_rows, 1.0),
            ("state", "wap_bad_staged", staged_bad, float(wap_bad_raised)),
        ],
        "kind string, k string, n long, val double",
    )
    return main_rows.unionByName(state_rows).orderBy("kind", "k")
