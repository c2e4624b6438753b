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
    for t in ("documents", "embeddings", "events"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
