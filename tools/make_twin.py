#!/usr/bin/env python3
"""Disjoint-twin fixture doubling (driver-side tooling only).

Builds <dst> as a 2x "disjoint twin" of <src>: every fact table is the
original concatenated with a copy whose
  - join keys are offset past the domain max (consistently across
    tables, so orders<->lineitem etc. still join within each half),
  - text is alphabet-rotated by 7 (the copy shares no k-grams with the
    original: duplicate/gram structure DOUBLES instead of exploding
    cross-half — the honest way to grow a dup-sensitive corpus),
  - embeddings are negated and coordinate-shifted by `rot` (same
    norms, disjoint geometry at every doubling -- pure negation is an
    involution and self-collides on the second application),
while the bounded dims nation/region are copied as-is. This is the
round-11 sf0.2 recipe, packaged so further doublings (sf0.4 = twin of
sf0.2) use the identical transform.

Usage: python3 tools/make_twin.py <src> <dst> [rot]

`rot` (default 7) is the alphabet rotation for the copied half. IT MUST
DIFFER between successive applications: applying the same rotation R
twice makes the grand-copy of the original IDENTICAL text to the first
copy (src = {0, R} -> dst = {0, R, R, 2R}), so cross-half duplicate
groups gain multiplicity and pair volume grows QUADRATICALLY in the
number of doublings -- a fixture artifact, not corpus growth (this is
exactly what the r16 sf0.8-at-rot-7 sweep measured: winnowing pairs
x3.61 on 2x data). Pick rotations whose pairwise DIFFERENCES are all
distinct mod 26, e.g. 7 then 3: {0,7} -> {0,7,3,10} -- all four halves
pairwise disjoint in gram space, duplicate structure exactly doubles.
The committed fixture chain: sf0.2 = twin(sf0.1, 7); sf0.4 =
twin(sf0.2, 7) -- HISTORICAL, self-colliding ({0,7,7,14}: rot-7 texts
have multiplicity 2), kept for continuity with the r15 records that
measured it; sf0.8 = twin(sf0.4, 3) -> {0,7,7,14}+{3,10,10,17}:
cross-half disjoint, so the sf0.4->sf0.8 DOUBLING is honest (duplicate
structure exactly doubles) even though sf0.4's internal multiplicity
remains its own documented quirk.
"""
import os
import sys

import duckdb

SRC, DST = sys.argv[1], sys.argv[2]
ROT = int(sys.argv[3]) if len(sys.argv) > 3 else 7

# key domains shared across tables: offset must be consistent per domain
DOMAINS = {
    "orderkey": ["orders.o_orderkey", "lineitem.l_orderkey"],
    "partkey": ["part.p_partkey", "lineitem.l_partkey"],
    "suppkey": ["supplier.s_suppkey", "lineitem.l_suppkey"],
    "custkey": ["customer.c_custkey", "orders.o_custkey"],
    "doc_id": ["documents.doc_id"],
    "vec_id": ["embeddings.vec_id"],
    "event_id": ["events.event_id"],
    "user_id": ["events.user_id"],
}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

off = {}
for dom, cols in DOMAINS.items():
    mx = max(con.sql(f"SELECT COALESCE(MAX({c.split('.')[1]}), 0) "
                     f"FROM {c.split('.')[0]}").fetchone()[0] for c in cols)
    off[dom] = int(mx) + 1


def domain_of(col):
    for dom in DOMAINS:
        if col.endswith(dom):
            return dom
    return None


_LOW = "abcdefghijklmnopqrstuvwxyz"
_UPP = _LOW.upper()
_rl = _LOW[ROT:] + _LOW[:ROT]
_ru = _UPP[ROT:] + _UPP[:ROT]
ROT_SQL = f"translate({{c}}, '{_LOW}{_UPP}', '{_rl}{_ru}')"


def copy_expr(table, col, dtype):
    dom = domain_of(col)
    if dom:
        return f"{col} + {off[dom]} AS {col}"
    if table == "documents" and col == "text":
        return ROT_SQL.format(c=col) + f" AS {col}"
    if col == "embedding":
        # negate AND cyclically shift coordinates by ROT: negation alone
        # is an involution (a second application reproduces the original
        # vectors -- every vec gains a geometric TWIN and cell/kNN pair
        # volume grows quadratically per doubling, the same fixture
        # artifact the text rotation had). The shifted negation keeps
        # norms exact, and distinct ROT values keep all halves disjoint
        # in geometry.
        return (f"list_transform(list_concat({col}[{ROT}+1:], "
                f"{col}[1:{ROT}]), x -> -x) AS {col}")
    return col


os.makedirs(DST, exist_ok=True)
for t in ["region", "nation"]:
    con.sql(f"COPY (SELECT * FROM {t}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
for t in ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]:
    cols = con.sql(f"DESCRIBE SELECT * FROM {t}").fetchall()
    copy_cols = ", ".join(copy_expr(t, c[0], c[1]) for c in cols)
    con.sql(f"COPY (SELECT * FROM {t} UNION ALL BY NAME "
            f"SELECT {copy_cols} FROM {t}) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n_src = con.sql(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
    n_dst = duckdb.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    assert n_dst == 2 * n_src, (t, n_src, n_dst)
    print(f"{t}: {n_src} -> {n_dst}")
print("done:", DST)
