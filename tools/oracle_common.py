"""Shared DuckDB harness bits for the oracle tools (driver-side only).

ONE definition of the test-table list and the view/oracle loading, so
local_verify.py and oracle_type_lint.py cannot drift when the corpus
grows a table (events/documents/embeddings were each added this way).
"""
import json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect_with_views(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def load_oracles(out_dir):
    return json.load(open(f"{out_dir}/oracle_sql.json"))
