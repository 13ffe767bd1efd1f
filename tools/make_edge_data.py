"""Build an adversarial SF directory: sf0.001 plus the edge rows that
historically caused (or could cause) cross-engine divergence — empty and
single-word documents, all-stopword and repeated-space texts, half-cent
money values (the round() class VERDICT r4 diagnosed), exact date
boundaries (the q12 30-day class), negative/NULL event values, and a
zero-quantity lineitem (a dq_checks range violation both engines must
count identically).

Usage: python tools/make_edge_data.py [out_dir]   (default /tmp/sf_edge)

Then: python tools/check_oracle.py /tmp/sf_edge — every registered query
must still hash-match DuckDB on the hostile rows. This is the committed
form of the fix-forcing discipline: the empty-document sequence(1, 0)
divergence in char_coverage was found by review; this gate catches that
class mechanically for every future query.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"

EDGE_DOCS = [
    (9001, "", "en", "src_edge", 0),
    (9002, "word", "en", "src_edge", 4),
    (9003, "a a a a a a a a a a", "en", "src_edge", 19),
    (9004, "a  b   c", "en", "src_edge", 8),  # repeated spaces → '' tokens
    (9005, "the quick " * 400 + "end", "en", "src_edge", 4003),
]

# half-cent doubles whose shortest decimal repr sits on .xx5 — the class
# where Spark round() (HALF_UP on shortest repr) diverges from DuckDB
# round() (binary value); floor(x*100 + 0.5) must agree on both
HALF_CENTS = (1.115, 2.675, 0.005, 1234.565)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_edge"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'")

    con.sql(f"CREATE TABLE d AS SELECT * FROM '{SRC}/documents.parquet'")
    for row in EDGE_DOCS:
        con.sql("INSERT INTO d VALUES (?, ?, ?, ?, ?)", params=list(row))
    con.sql(f"COPY d TO '{out}/documents.parquet'")

    con.sql(f"CREATE TABLE e AS SELECT * FROM '{SRC}/events.parquet'")
    con.sql(
        "INSERT INTO e VALUES "
        "(99001, TIMESTAMP '1970-01-01 00:00:00', 9001, 'view', -1.005, '{}'),"
        "(99002, TIMESTAMP '2024-02-29 23:59:59.999999', 9001, 'click',"
        " 12345678.005, NULL),"
        "(99003, TIMESTAMP '2024-03-01 00:00:00', 9002, 'purchase', NULL, '{}')"
    )
    con.sql(f"COPY e TO '{out}/events.parquet'")

    con.sql(f"CREATE TABLE o AS SELECT * FROM '{SRC}/orders.parquet'")
    con.sql(
        "INSERT INTO o VALUES "
        f"(990001, 1, 'O', {HALF_CENTS[0]!r}, TIMESTAMP '1996-01-01 00:00:00',"
        " '1-URGENT'),"
        f"(990002, 2, 'F', {HALF_CENTS[1]!r},"
        " TIMESTAMP '1995-12-31 23:59:59.999999', '5-LOW')"
    )
    con.sql(f"COPY o TO '{out}/orders.parquet'")

    con.sql(f"CREATE TABLE l AS SELECT * FROM '{SRC}/lineitem.parquet'")
    # a lineitem exactly ON the q12 30-day boundary of its edge order, one
    # a µs past it, a zero-quantity range violation, and half-cent prices
    con.sql(
        "INSERT INTO l VALUES "
        f"(990001, 1, 1, 1, 5.0, {HALF_CENTS[2]!r}, 0.05, 0.02, 'N', 'O',"
        " TIMESTAMP '1996-01-31 00:00:00'),"
        f"(990001, 2, 2, 2, 0.0, {HALF_CENTS[3]!r}, 0.0, 0.0, 'R', 'F',"
        " TIMESTAMP '1996-01-31 00:00:00.000001'),"
        f"(990002, 3, 3, 1, 51.0, {HALF_CENTS[0]!r}, 0.15, 0.08, 'A', 'F',"
        " TIMESTAMP '1996-01-30 23:59:59.999999')"
    )
    con.sql(f"COPY l TO '{out}/lineitem.parquet'")
    print(f"wrote edge tables to {out}")


if __name__ == "__main__":
    main()
