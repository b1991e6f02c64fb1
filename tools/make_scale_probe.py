#!/usr/bin/env python3
"""Build an 8x scale probe dataset from sf0.1 (driver-side tooling only).

Replicates every table with consistent FK offsets so joins stay valid:
keys get +k*stride per replica; document texts are perturbed per replica
(so near-dup structure does not inflate 64x); embeddings are rotated per
replica (distinct vectors, same norms); event times shift per replica.
region/nation are dimension tables and stay as-is (FKs unchanged).

With --fresh-docs, replicas 1..k-1 of `documents` are GENUINELY NEW
documents instead of token-suffixed copies: tokens are hash-sampled from
the source corpus's vocabulary AT ITS OBSERVED FREQUENCIES (so shingle
document frequency and LSH bucket occupancy grow with the corpus, the
adversarial case for the dedup family that suffixed replication masks),
and 1 source doc in 20 additionally spawns a near-dup twin (same sampled
token stream with ~4%% of positions re-sampled) so the corpus keeps a
linear-in-n near-dup population to find.

Usage: python3 tools/make_scale_probe.py /root/testdata/sf0.1 /tmp/sf0.8 8 [--fresh-docs]
"""
import sys

import duckdb


def fresh_docs_sql(src, dk):
    """Vocabulary-frequency-preserving fresh documents for replicas k>0."""
    return f"""
WITH srcdocs AS (SELECT doc_id, text, lang, source FROM read_parquet('{src}/documents.parquet')),
tok0 AS (SELECT doc_id, lang, source, string_split_regex(text, '\\s+') AS ts FROM srcdocs),
vocab AS (SELECT w, COUNT(*) AS cnt
          FROM (SELECT unnest(ts) AS w FROM tok0) GROUP BY 1),
vcum AS (SELECT w, COALESCE(SUM(cnt) OVER (ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo FROM vocab),
tot AS (SELECT SUM(cnt) AS t FROM vocab),
base AS (SELECT doc_id, lang, source, len(ts) AS n FROM tok0),
newdocs AS (
  SELECT doc_id + k*{dk} AS nid, doc_id AS sid, k, n, lang, source, FALSE AS twin
  FROM base, r WHERE k > 0
  UNION ALL
  SELECT doc_id + (k+8)*{dk} AS nid, doc_id AS sid, k, n, lang, source, TRUE AS twin
  FROM base, r WHERE k > 0 AND doc_id % 20 = 0),
pos AS (SELECT nid, sid, k, twin, lang, source, unnest(range(n)) AS p FROM newdocs),
picks AS (SELECT nid, sid, k, twin, lang, source, p,
  CASE WHEN twin AND hash(sid*31 + p*61 + k) % 25 = 0
       THEN hash(sid*999331 + k*104729 + p) % t.t
       ELSE hash(sid*1000003 + k*7919 + p) % t.t END AS rr
  FROM pos, tot t),
words AS (SELECT pk.nid, pk.p, pk.lang, pk.source, v.w
          FROM picks pk ASOF JOIN vcum v ON pk.rr >= v.lo),
assembled AS (SELECT nid AS doc_id, string_agg(w, ' ' ORDER BY p) AS text,
                     any_value(lang) AS lang, any_value(source) AS source
              FROM words GROUP BY nid)
SELECT doc_id, text, lang, source, length(text) AS n_chars FROM assembled
UNION ALL
SELECT doc_id, text, lang, source, length(text) AS n_chars FROM srcdocs"""


def main(src, dst, reps, fresh_docs=False):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({reps})) AS k")

    def copy(name, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n}")

    import os
    os.makedirs(dst, exist_ok=True)

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    ck = con.sql(f"SELECT max(c_custkey)+1 FROM read_parquet('{src}/customer.parquet')").fetchone()[0]
    ok = con.sql(f"SELECT max(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    pk = con.sql(f"SELECT max(p_partkey)+1 FROM read_parquet('{src}/part.parquet')").fetchone()[0]
    sk = con.sql(f"SELECT max(s_suppkey)+1 FROM read_parquet('{src}/supplier.parquet')").fetchone()[0]
    ek = con.sql(f"SELECT max(event_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    uk = con.sql(f"SELECT max(user_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    dk = con.sql(f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
    vk = con.sql(f"SELECT max(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]

    copy("customer",
         f"SELECT c_custkey + k*{ck} AS c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal "
         f"FROM read_parquet('{src}/customer.parquet'), r")
    copy("supplier",
         f"SELECT s_suppkey + k*{sk} AS s_suppkey, s_name, s_nationkey, s_acctbal "
         f"FROM read_parquet('{src}/supplier.parquet'), r")
    copy("part",
         f"SELECT p_partkey + k*{pk} AS p_partkey, p_name, p_brand, p_type, p_retailprice "
         f"FROM read_parquet('{src}/part.parquet'), r")
    copy("orders",
         f"SELECT o_orderkey + k*{ok} AS o_orderkey, o_custkey + k*{ck} AS o_custkey, "
         f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
         f"FROM read_parquet('{src}/orders.parquet'), r")
    copy("lineitem",
         f"SELECT l_orderkey + k*{ok} AS l_orderkey, l_partkey + k*{pk} AS l_partkey, "
         f"l_suppkey + k*{sk} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
         f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
         f"FROM read_parquet('{src}/lineitem.parquet'), r")
    copy("events",
         f"SELECT event_id + k*{ek} AS event_id, ts + INTERVAL (k) HOUR AS ts, "
         f"user_id + k*{uk} AS user_id, event_type, value, props "
         f"FROM read_parquet('{src}/events.parquet'), r")
    if fresh_docs:
        copy("documents", fresh_docs_sql(src, dk))
    else:
        # suffix every token with the replica id (k>0): zero cross-replica
        # shingle overlap, so near-dup pair structure scales exactly 8x
        # instead of 64x (the output-cardinality trap of naive replication)
        copy("documents",
             f"SELECT doc_id + k*{dk} AS doc_id, "
             f"CASE WHEN k = 0 THEN text ELSE "
             f"array_to_string(list_transform(string_split_regex(text, '\\s+'), t -> t || k), ' ') "
             f"END AS text, "
             f"lang, source, n_chars FROM read_parquet('{src}/documents.parquet'), r")
    # rotate embedding by k components: distinct vectors, same norm/stats
    copy("embeddings",
         f"SELECT vec_id + k*{vk} AS vec_id, "
         f"list_transform(range(1, 65), i -> embedding[CAST((i - 1 + k) % 64 + 1 AS INT)]) AS embedding, "
         f"label FROM read_parquet('{src}/embeddings.parquet'), r")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         fresh_docs="--fresh-docs" in sys.argv[4:])
