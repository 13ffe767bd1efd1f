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

#: degenerate suffix-structure shapes (round 10): the staircase (one
#: token repeated — every suffix a prefix of every longer one) and the
#: boilerplate block two docs share verbatim (constant-LCP plateaus)
_STAIRCASE = ("dup " * 5000).strip()
_BOILER = " ".join(f"boiler{i}" for i in range(24))

EDGE_DOCS = [
    (9001, "", "en", "src_edge", 0),
    (9002, "word", "en", "src_edge", 4),
    (9003, "a a a a a a a a a a", "en", "src_edge", 19),
    (9004, "a  b   c", "en", "src_edge", 8),  # repeated spaces → '' tokens
    (9005, "the quick " * 400 + "end", "en", "src_edge", 4003),
    # multi-line, punctuation-rich docs: the standard corpus is
    # single-line lowercase word soup, so without these the C4
    # line-filter booleans (terminal punctuation, '{', lorem ipsum,
    # javascript markers) and the Gopher symbol-ratio rule never flip
    (
        9006,
        "the quick brown fox jumps over it.\nshort line\n"
        "this one has braces { inside } and enough words here\n"
        'a full sentence of five words ends with a quote"\n'
        "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n"
        "enable JavaScript to view this page properly today!",
        "en",
        "src_edge",
        255,
    ),
    (9007, "### ### ### to the of and...", "en", "src_edge", 28),
    (9008, "one two three four.\n\nsix seven eight nine ten?", "en", "src_edge", 46),
    # round-6 quantile/containment edges: a source whose lengths are ALL
    # identical (discrete p5 = p95 — the degenerate-bounds case of
    # length_quantile_filter, which must keep every doc), including two
    # byte-identical texts (exact-collapse inside the degenerate source),
    # and a single-document source (rank 1 is both bounds).
    # round-10 suffix/ANSV edges (VERDICT r9 #1): the degenerate LCP
    # shapes. 9014 is ONE token repeated 5000x — the staircase corpus
    # where every suffix is a prefix of every longer one; 9015/9016
    # share a 24-token boilerplate block verbatim — together with the
    # corpus-wide duplicate groups this drives constant-LCP plateaus,
    # the shape whose pending set is O(partition) inside the ANSV
    # range partitions (the executor-side resolver's worst case).
    (9014, _STAIRCASE, "en", "src_edge", len(_STAIRCASE)),
    (9015, _BOILER + " unique tail alpha", "en", "src_edge",
     len(_BOILER + " unique tail alpha")),
    (9016, "unique head beta " + _BOILER, "en", "src_edge",
     len("unique head beta " + _BOILER)),
    (9010, "aa bb cc dd", "en", "src_same", 11),
    (9011, "ee ff gg hh", "en", "src_same", 11),
    (9012, "ee ff gg hh", "en", "src_same", 11),  # byte-identical to 9011
    (9013, "lonely single document here", "en", "src_solo", 27),
]

# half-cent doubles whose shortest decimal repr sits on .xx5 — the class
# where Spark round() (HALF_UP on shortest repr) diverges from DuckDB
# round() (binary value); floor(x*100 + 0.5) must agree on both
HALF_CENTS = (1.115, 2.675, 0.005, 1234.565)

# arbitrary-mantissa doubles (VERDICT r5 #8): values whose full 52-bit
# mantissa is populated — not representable as any short decimal — the
# one input class where an engine whose expression pipeline contracts
# a*b+c into fma(a,b,c) could flip floor(x*100 + 0.5) while short
# decimals never would. Generated once from a fixed seed and inlined so
# the file stays deterministic without importing numpy.
FULL_MANTISSA = (
    7.146936801276823,      # 0x401C966B06A3D566
    1234.5678901234567,     # populated low mantissa bits
    0.014999999999999999,   # nearest-double just below 0.015
    2.2250738585072014e-2,  # scaled min-normal mantissa pattern
    993.1150999999999,      # carries into the .5 boundary after *100
)


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
        "(99003, TIMESTAMP '2024-03-01 00:00:00', 9002, 'purchase', NULL, '{}'),"
        # full-mantissa value: the window_functions run_cents /
        # group_linreg y quantization input class
        f"(99004, TIMESTAMP '2024-03-01 00:00:01', 9002, 'view',"
        f" {FULL_MANTISSA[0]!r}, '{{}}'),"
        f"(99005, TIMESTAMP '2024-03-01 00:00:02', 9002, 'click',"
        f" {FULL_MANTISSA[4]!r}, '{{}}'),"
        # round-6 KS edge: an event_type whose population is entirely
        # even-user (n_b = 0) — ks_drift_check must emit NULL ks on both
        # engines instead of dividing by zero
        "(99006, TIMESTAMP '2024-03-02 00:00:00', 9002, 'edge_onesided',"
        " 1.5, '{}'),"
        "(99007, TIMESTAMP '2024-03-02 01:00:00', 9004, 'edge_onesided',"
        " 2.5, '{}'),"
        # round-6 streak edges: user 9005 active on exactly consecutive
        # days (one unbroken island), user 9007 once (streak of 1)
        "(99008, TIMESTAMP '2024-04-01 12:00:00', 9005, 'view', 1.0, '{}'),"
        "(99009, TIMESTAMP '2024-04-02 12:00:00', 9005, 'view', 1.0, '{}'),"
        "(99010, TIMESTAMP '2024-04-03 12:00:00', 9005, 'view', 1.0, '{}'),"
        "(99011, TIMESTAMP '2024-04-10 09:00:00', 9007, 'view', 1.0, '{}')"
    )
    con.sql(f"COPY e TO '{out}/events.parquet'")

    con.sql(f"CREATE TABLE o AS SELECT * FROM '{SRC}/orders.parquet'")
    con.sql(
        "INSERT INTO o VALUES "
        f"(990001, 1, 'O', {HALF_CENTS[0]!r}, TIMESTAMP '1996-01-01 00:00:00',"
        " '1-URGENT'),"
        f"(990002, 2, 'F', {HALF_CENTS[1]!r},"
        " TIMESTAMP '1995-12-31 23:59:59.999999', '5-LOW'),"
        # parent of the full-mantissa lineitems, full-mantissa total
        f"(990003, 3, 'O', {FULL_MANTISSA[1]!r},"
        " TIMESTAMP '1996-06-01 00:00:00', '2-HIGH')"
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
        " TIMESTAMP '1996-01-30 23:59:59.999999'),"
        # full-mantissa money values: every quantization (decimal cents,
        # binary bits probe) must agree on doubles with no short decimal
        f"(990003, 1, 4, 2, 3.0, {FULL_MANTISSA[0]!r}, {FULL_MANTISSA[2]!r},"
        " 0.01, 'N', 'O', TIMESTAMP '1996-06-15 12:00:00'),"
        f"(990003, 2, 5, 3, 7.0, {FULL_MANTISSA[1]!r}, {FULL_MANTISSA[3]!r},"
        " 0.03, 'R', 'F', TIMESTAMP '1996-07-01 00:00:00'),"
        f"(990003, 3, 6, 1, 11.0, {FULL_MANTISSA[4]!r}, 0.07,"
        " 0.04, 'A', 'F', TIMESTAMP '1996-08-20 06:30:00')"
    )
    con.sql(f"COPY l TO '{out}/lineitem.parquet'")
    print(f"wrote edge tables to {out}")


if __name__ == "__main__":
    main()
