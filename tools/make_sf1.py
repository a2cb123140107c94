"""Materialize a local sf1 dataset (~10× sf0.1: 6M lineitem) for the
SCALE.md tenth wave — the 0.1→1 step that upgrades the 100× claims
from extrapolation to measurement one decade closer.

Replication recipe (deterministic, duckdb-only, no Spark): each table
is unioned 10× with key offsets so joins stay key-consistent across
replicas (orderkey offsets match between orders and lineitem, etc.).
Content columns are salted per replica where exact duplication would
CHANGE a query's asymptotics rather than its data volume:

- documents.text gets a per-replica salt token — otherwise exact/near
  dedup queries collapse 10 replicas into the sf0.1 candidate set and
  measure nothing;
- embeddings.embedding gets a small deterministic per-replica rotation
  of the first two coordinates — otherwise 10 identical copies inflate
  within-cluster pair counts ~45× by construction (a data artifact,
  not a plan property).

Output: <repo>/.scale/sf1/*.parquet (gitignored).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale", "sf1",
)
REPLICAS = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rep(table: str, select_template: str) -> None:
    parts = []
    for r in range(REPLICAS):
        parts.append(
            "SELECT "
            + select_template.format(r=r)
            + f" FROM '{SRC}/{table}.parquet'"
        )
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/{table}.parquet'"
    ).fetchone()[0]
    print(f"{table}: {n}")


# key strides: comfortably above each table's max key in sf0.1
O = 10_000_000   # orderkey stride
C = 1_000_000    # custkey stride
P = 1_000_000    # partkey stride
S = 100_000      # suppkey stride
E = 10_000_000   # event stride
D = 1_000_000    # doc stride
V = 1_000_000    # vec stride

# region/nation are FK targets with small fixed key domains
# (nationkey 0..24) shared by every replica — they must NOT replicate,
# or every nation join fans out 10x; all other tables replicate WITH
# key offsets so per-key join fan-out is preserved exactly.
for tiny in ("region", "nation"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{tiny}.parquet') TO "
        f"'{DST}/{tiny}.parquet' (FORMAT PARQUET)"
    )
    print(tiny, "copied 1x")
rep("customer",
    "c_custkey + {r}*" + str(C) + " AS c_custkey, c_name, "
    "c_nationkey, c_acctbal, c_mktsegment")
rep("supplier",
    "s_suppkey + {r}*" + str(S) + " AS s_suppkey, s_name, "
    "s_nationkey, s_acctbal")
rep("part",
    "p_partkey + {r}*" + str(P) + " AS p_partkey, p_name, "
    "p_brand, p_type, p_size, p_retailprice")
rep("orders",
    "o_orderkey + {r}*" + str(O) + " AS o_orderkey, "
    "o_custkey + {r}*" + str(C) + " AS o_custkey, o_orderstatus, "
    "o_totalprice, o_orderdate, o_orderpriority")
rep("lineitem",
    "l_orderkey + {r}*" + str(O) + " AS l_orderkey, "
    "l_partkey + {r}*" + str(P) + " AS l_partkey, "
    "l_suppkey + {r}*" + str(S) + " AS l_suppkey, l_linenumber, "
    "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
    "l_linestatus, l_shipdate")
rep("events",
    "event_id + {r}*" + str(E) + " AS event_id, ts, "
    "user_id + {r}*1000000 AS user_id, event_type, value, props")
rep("documents",
    "doc_id + {r}*" + str(D) + " AS doc_id, "
    "CASE WHEN {r} = 0 THEN text "
    "ELSE text || ' replsalt{r}tok' END AS text, "
    "lang, source, n_chars + CASE WHEN {r} = 0 THEN 0 ELSE 13 END "
    "AS n_chars")
rep("embeddings",
    "vec_id + {r}*" + str(V) + " AS vec_id, "
    "CASE WHEN {r} = 0 THEN embedding ELSE "
    "list_concat(["
    "  embedding[1] * CAST(cos(0.03*{r}) AS FLOAT)"
    "  - embedding[2] * CAST(sin(0.03*{r}) AS FLOAT),"
    "  embedding[1] * CAST(sin(0.03*{r}) AS FLOAT)"
    "  + embedding[2] * CAST(cos(0.03*{r}) AS FLOAT)], "
    " embedding[3:]) END AS embedding, label")
print("sf1 materialized at", DST)
