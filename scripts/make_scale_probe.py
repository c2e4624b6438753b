"""Generate an amplified documents/embeddings layout for scale probing
(VERDICT r6 task 5: probe the iterative/driver-loop family at 10× the
bench scale). NOT graded data — a stress layout derived from the
driver's own sf0.1 parquet:

- documents: N copies; copy 0 is verbatim, copy i>0 re-keys doc_id,
  suffixes the source (so source-blocked baselines stay linear in the
  copy count) and suffixes EVERY token with `_ci` — all token/shingle
  hashes differ per copy, so each copy carries the original's internal
  near-dup structure without creating cross-copy near-dups: the dup
  graph scales linearly, exactly like ingesting N independent crawls.
- embeddings: N copies with re-keyed vec_id (identical vectors — the
  k-means/PCA/IVF loops see 10× the points per cell, which is the
  pressure being probed).
- events: N copies as independent user cohorts (re-keyed event/user
  ids, timestamps verbatim) — per-user windows stay constant-size,
  the user population grows, which is how event streams scale.
- TPC-H star (round 9): region/nation verbatim (fixed dims);
  customer/supplier/part/orders/lineitem re-key with one consistent
  offset per copy so FKs stay intact — N independent regions' books.
  This lets the probe cover the window/join/SQL-API families, not
  just the documents/embeddings heavy hitters.

Usage: python scripts/make_scale_probe.py [SRC] [OUT] [COPIES]
Defaults: /root/testdata/sf0.1 /tmp/testdata_sf1 10
"""

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(rf"""
    COPY (
      SELECT doc_id + c.i * 10000000 AS doc_id,
             CASE WHEN c.i = 0 THEN text
                  ELSE regexp_replace(text, '(\S+)', '\1_c' || c.i, 'g')
             END AS text,
             lang,
             source || CASE WHEN c.i = 0 THEN '' ELSE '_c' || c.i END
               AS source,
             n_chars
      FROM read_parquet('{src}/documents.parquet'),
           (SELECT unnest(range({copies})) AS i) c
    ) TO '{out}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + c.i * 10000000 AS vec_id, embedding, label
      FROM read_parquet('{src}/embeddings.parquet'),
           (SELECT unnest(range({copies})) AS i) c
    ) TO '{out}/embeddings.parquet' (FORMAT parquet)
    """)
    # events: re-keyed users/event ids per copy, timestamps verbatim —
    # copies behave like independent user cohorts, which is exactly the
    # pressure on user-keyed windows / journey censuses
    con.execute(f"""
    COPY (
      SELECT event_id + c.i * 100000000 AS event_id, ts,
             user_id + c.i * 10000000 AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet'),
           (SELECT unnest(range({copies})) AS i) c
    ) TO '{out}/events.parquet' (FORMAT parquet)
    """)
    # TPC-H-ish star: region/nation are fixed-cardinality dims (copied
    # verbatim — they do NOT grow with the corpus, exactly like
    # production), the fact/dim tables amplify with CONSISTENT key
    # offsets so referential integrity holds per copy (copy i's orders
    # reference copy i's customers etc.) — N independent regions'
    # books, which is how a star schema actually reaches 100 TB.
    off = 10_000_000
    for t in ("region", "nation"):
        con.execute(f"""
        COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
        TO '{out}/{t}.parquet' (FORMAT parquet)
        """)
    amplified = {
        # names are RE-KEYED (digits replaced with the new key), not
        # suffixed: TPC-H names are 'Customer#000000001' and several
        # operators block on a name PREFIX (join_fuzzy: substr 1..16).
        # With a suffix, all N copies share the prefix block and
        # block density grows N× (quadratic candidate growth that
        # real 10× data does NOT have — at any real scale the
        # zero-padded digits spread keys across blocks of ≤100).
        "customer": f"""
          SELECT c_custkey + c.i * {off} AS c_custkey,
                 CASE WHEN c.i = 0 THEN c_name
                      ELSE 'Customer#' ||
                           lpad(CAST(c_custkey + c.i * {off} AS VARCHAR),
                                9, '0')
                 END AS c_name,
                 c_nationkey, c_acctbal, c_mktsegment""",
        "supplier": f"""
          SELECT s_suppkey + c.i * {off} AS s_suppkey,
                 CASE WHEN c.i = 0 THEN s_name
                      ELSE 'Supplier#' ||
                           lpad(CAST(s_suppkey + c.i * {off} AS VARCHAR),
                                9, '0')
                 END AS s_name,
                 s_nationkey, s_acctbal""",
        "part": f"""
          SELECT p_partkey + c.i * {off} AS p_partkey,
                 p_name || CASE WHEN c.i = 0 THEN '' ELSE '_c' || c.i END
                   AS p_name,
                 p_brand, p_type, p_size, p_retailprice""",
        "orders": f"""
          SELECT o_orderkey + c.i * {off} AS o_orderkey,
                 o_custkey + c.i * {off} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate,
                 o_orderpriority""",
        "lineitem": f"""
          SELECT l_orderkey + c.i * {off} AS l_orderkey,
                 l_partkey + c.i * {off} AS l_partkey,
                 l_suppkey + c.i * {off} AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate""",
    }
    for t, sel in amplified.items():
        con.execute(f"""
        COPY ({sel}
              FROM read_parquet('{src}/{t}.parquet'),
                   (SELECT unnest(range({copies})) AS i) c
        ) TO '{out}/{t}.parquet' (FORMAT parquet)
        """)
    for t in ("documents", "embeddings", "events", "region", "nation",
              "customer", "supplier", "part", "orders", "lineitem"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
