"""Null-robustness sweep for the oracle registry (VERDICT r7 item 6).

The driver's testdata currently contains NO nulls, so any Spark/DuckDB
null-semantics divergence in a (query, twin) pair is latent — it "passes
because sf0.01 lacks the edge" (the W06 class: the twin assumed non-null
events.value and broke the day the operator's null filter mattered).

This tool makes the edge real: it copies a small sf dir to a scratch
location, injects a deterministic ~5% of NULLs into the plausible
nullable NON-KEY columns (documents.text/lang, events.value/event_type/
props, customer.c_mktsegment/c_acctbal, orders.o_orderpriority,
lineitem.l_returnflag), and runs the full check_correctness gate on it.
A twin that diverges from its operator on nulls fails the value hash
here even though the stock gate is green.

Determinism: row selection is hash(key) % 20 == r per column (r varies
by column), so reruns and engines agree.

Usage: python tools/check_nulls.py [src_sf_dir] [name_filter...]
Exit 0 = every oracle pair is null-robust (or legitimately skipped).

Some queries CONSUME the injected columns as mandatory inputs in their
build step (driver-side collects — e.g. BPE training on text) and raise
on null before any comparison happens; those surface as SPARK/DUCKDB
errors, not silent wrongness, which is the acceptable contract. Use the
name filters to focus.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (table, column, residue) — residue varies so nulls don't align across columns
INJECT = [
    ("documents", "text", "doc_id", 3),
    ("documents", "lang", "doc_id", 7),
    ("documents", "n_chars", "doc_id", 18),
    ("events", "value", "event_id", 4),
    ("events", "event_type", "event_id", 11),
    ("events", "props", "event_id", 16),
    ("customer", "c_mktsegment", "c_custkey", 5),
    ("customer", "c_acctbal", "c_custkey", 12),
    ("orders", "o_orderpriority", "o_orderkey", 9),
    ("lineitem", "l_returnflag", "l_orderkey", 14),
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# (table, key) for the --dupes mode: append a full copy of ~5% of rows
# (hash(key) % 20 == residue) — the at-least-once-delivery reality of a
# 100 TB ingest. Catches twins/operators that silently assume key
# uniqueness (one engine deduping where the other multiplies).
DUP = [
    ("documents", "doc_id", 6),
    ("embeddings", "vec_id", 13),
    ("events", "event_id", 8),
    ("orders", "o_orderkey", 2),
    ("lineitem", "l_orderkey", 17),
    ("customer", "c_custkey", 10),
]


def build_nulled_dir(src: str, dst: str, mode: str = "null") -> None:
    """mode='null' injects NULLs into every INJECT column; mode='empty'
    injects '' into the STRING columns only (empty-vs-null is its own
    divergence class: e.g. DuckDB string_split('') vs Spark split(''));
    mode='dupes' appends full-row duplicates of ~5% of rows per DUP."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    if mode == "unicode":
        # append multibyte/accented/case-folding-edge tokens to ~10% of
        # document texts: certifies that lower()/regex tokenization/md5
        # agree across engines beyond ASCII (JVM vs utf8proc). ß and the
        # Turkish-adjacent İ-class stay out of the CAPITAL-CASE domain
        # (documented JVM 1->2 expansions) but are fair game for the
        # lower/tokenize/hash paths exercised here.
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "documents":
                con.execute(
                    f"""COPY (SELECT doc_id,
                        CASE WHEN hash(doc_id) % 20 = 5
                               THEN text || ' Café MÜNCHEN straße 中文 Ωmega ß'
                             WHEN hash(doc_id) % 20 = 9
                               THEN 'ÉLAN résumé ' || text
                             ELSE text END AS text,
                        lang, source, n_chars FROM read_parquet('{src_file}'))
                        TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "longdocs":
        # append 8 very LONG documents (2,200-3,400 words — straddling
        # the 2,147-shingle int32 boundary): at 100 TB long docs are
        # routine, but the driver corpus maxes ~100 words, so any int32
        # arithmetic on F.size outputs (shingle counts, token counts,
        # gram positions) is invisible to every other family. ADVICE r9
        # found exactly this class in dd09 (`n_y * 1_000_000` raising
        # ARITHMETIC_OVERFLOW under ANSI once a doc has >2147 shingles);
        # this family makes it a live gate failure. The word sequence is
        # deterministic (DuckDB hash of the position); docs 2k and 2k+1
        # share ONE generator with different lengths, so each pair is a
        # true prefix-containment near-dup — the candidate joins produce
        # real pairs of >2147-shingle docs, which is what forces the
        # suspect arithmetic to actually evaluate on big counts (an
        # overflow expression inside a join filter never fires if long
        # docs never pair).
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "documents":
                con.execute(
                    f"""COPY (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT 900000000 + j AS doc_id,
                               array_to_string(
                                 list_transform(generate_series(1, 2200 + j * 171),
                                   i -> 'w' || (hash(i * 4 + (j // 2)) % 100000)), ' ') AS text,
                               'en' AS lang, 'synthetic-long' AS source,
                               strlen(array_to_string(
                                 list_transform(generate_series(1, 2200 + j * 171),
                                   i -> 'w' || (hash(i * 4 + (j // 2)) % 100000)), ' '))::BIGINT AS n_chars
                        FROM (SELECT unnest(generate_series(0, 7)) AS j)
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "negatives":
        # flip the SIGN of ~5% of events.value, customer.c_acctbal and
        # orders.o_totalprice (deterministic hash pick): certifies
        # sign-safety of every floor/DIV/ratio formula pair —
        # floor(-x*1e6) vs CAST, DuckDB `//` vs Spark DIV on negative
        # operands, z-scores/quantiles/winsorizing with negative tails,
        # price-bucket floors and bit-algebra (Morton) keys on negative
        # buckets. Real pipelines carry refunds, corrections, and signed
        # deltas; the driver data is all-positive so this class is
        # otherwise invisible.
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "events":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE WHEN hash(event_id) % 20 = 7 THEN -value ELSE value END AS value)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "customer":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE WHEN hash(c_custkey) % 20 = 15 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "orders":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE WHEN hash(o_orderkey) % 20 = 3 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "badjson":
        # overwrite ~8% of events.props (8 variants, hash % 100 in 0..7)
        # with MESSY-but-realistic JSON: a
        # semi-structured 100 TB feed carries type drift (floats,
        # stringified numbers, scientific notation), tombstone 'null's,
        # arrays, JSON5-ish garbage, and out-of-range integers. The
        # schema'd from_json engine contract reads every one of these as
        # NULL k (strict integer token or nothing) — the twin must too:
        # an unguarded json_extract_string + TRY_CAST silently COERCES
        # 1.5 -> 2, '"7"' -> 7, 1e3 -> 1000 (caught live in r10).
        # Duplicate keys stay out: RFC-8259-undefined, engines disagree
        # by design (Jackson last-wins, yyjson first-wins).
        variants = [
            '{"k": 1.5}', '{"k": "7"}', '{"k": 1e3}', 'null', '{k:1}',
            '[1, 2]', '{"k": 99999999999999999999}', '{"k": true}',
        ]
        whens = " ".join(
            f"WHEN hash(event_id) % 100 = {i} THEN '{v}'"
            for i, v in enumerate(variants)
        )
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "events":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE {whens} ELSE props END AS props)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "tsextremes":
        # shift ~2.5% of events.ts and orders.o_orderdate back 100 years
        # (NEGATIVE epoch seconds) and another ~2.5% forward 100 years:
        # the time-domain analog of --negatives. Spark's window()/
        # date_trunc FLOOR negative epochs while DuckDB `//` (and Spark
        # DIV) truncate toward zero, so any twin that rebuilds a window
        # start as `(epoch // width) * width` lands one full bucket late
        # for pre-1970 rows. Web-scale corpora carry garbage timestamps
        # (epoch-0 defaults, unit mixups) routinely; the driver data is
        # all-2024 so the class is otherwise invisible. Streaming replays
        # stay deterministic because each table is ONE parquet file ==
        # one micro-batch (watermark only advances after it).
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "events":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE WHEN hash(event_id) % 40 = 3 THEN ts - INTERVAL 100 YEAR
                             WHEN hash(event_id) % 40 = 21 THEN ts + INTERVAL 100 YEAR
                             ELSE ts END AS ts)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "orders":
                con.execute(
                    f"""COPY (SELECT * REPLACE (
                        CASE WHEN hash(o_orderkey) % 40 = 5 THEN o_orderdate - INTERVAL 100 YEAR
                             WHEN hash(o_orderkey) % 40 = 27 THEN o_orderdate + INTERVAL 100 YEAR
                             ELSE o_orderdate END AS o_orderdate)
                        FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "skewhot":
        # POWER-LAW HOT KEYS under NEW ids (r11): replicate the hottest
        # user's events x200, one document's text x60, the busiest
        # customer's orders (and their lineitems) x50, and one embedding
        # x30 — each copy gets a FRESH primary key, so unlike --dupes
        # these rows are legitimately DISTINCT and cannot be collapsed
        # by the idempotent-ingest distinct. What this certifies: (a)
        # hot-key skew does not change CORRECTNESS (both engines see the
        # same data; group sizes just explode), and (b) every ranking /
        # top-k / ntile whose order key now has massive VALUE TIES still
        # breaks them by a total order (ids) — at 100 TB boilerplate
        # docs and power-law users make both conditions the norm, while
        # the driver's uniform synthetic data never exercises them.
        # Rows are written in md5-of-key order: appended copies would
        # otherwise land in ascending-key file order and Spark's STABLE
        # sort makes tie order accidentally match an id tiebreak — the
        # teeth test (o01 with its tiebreak removed) passed by that
        # luck until the scramble broke the correlation.
        offs = 1_000_000_000_000
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t == "events":
                con.execute(
                    f"""COPY (
                        SELECT * FROM (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT e.* REPLACE (e.event_id + (r.k + 1) * {offs} AS event_id)
                        FROM read_parquet('{src_file}') e, range(200) r(k)
                        WHERE e.user_id = (
                          SELECT user_id FROM read_parquet('{src_file}')
                          GROUP BY 1 ORDER BY count(*) DESC, user_id LIMIT 1)
                        ) ORDER BY md5(CAST(event_id AS VARCHAR))
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "documents":
                con.execute(
                    f"""COPY (
                        SELECT * FROM (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT d.* REPLACE (
                          (SELECT max(doc_id) FROM read_parquet('{src_file}'))
                          + 1 + r.k AS doc_id)
                        FROM read_parquet('{src_file}') d, range(60) r(k)
                        WHERE d.doc_id = (SELECT min(doc_id) FROM read_parquet('{src_file}'))
                        ) ORDER BY md5(CAST(doc_id AS VARCHAR))
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "orders":
                con.execute(
                    f"""COPY (
                        SELECT * FROM (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT o.* REPLACE (o.o_orderkey + (r.k + 1) * {offs} AS o_orderkey)
                        FROM read_parquet('{src_file}') o, range(50) r(k)
                        WHERE o.o_custkey = (
                          SELECT o_custkey FROM read_parquet('{src_file}')
                          GROUP BY 1 ORDER BY count(*) DESC, o_custkey LIMIT 1)
                        ) ORDER BY md5(CAST(o_orderkey AS VARCHAR))
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "lineitem":
                con.execute(
                    f"""COPY (
                        SELECT * FROM (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT l.* REPLACE (l.l_orderkey + (r.k + 1) * {offs} AS l_orderkey)
                        FROM read_parquet('{src_file}') l, range(50) r(k)
                        WHERE l.l_orderkey IN (
                          SELECT o_orderkey FROM read_parquet('{src}/orders.parquet')
                          WHERE o_custkey = (
                            SELECT o_custkey FROM read_parquet('{src}/orders.parquet')
                            GROUP BY 1 ORDER BY count(*) DESC, o_custkey LIMIT 1))
                        ) ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            elif t == "embeddings":
                con.execute(
                    f"""COPY (
                        SELECT * FROM (
                        SELECT * FROM read_parquet('{src_file}')
                        UNION ALL
                        SELECT e.* REPLACE (
                          (SELECT max(vec_id) FROM read_parquet('{src_file}'))
                          + 1 + r.k AS vec_id)
                        FROM read_parquet('{src_file}') e, range(30) r(k)
                        WHERE e.vec_id = (SELECT min(vec_id) FROM read_parquet('{src_file}'))
                        ) ORDER BY md5(CAST(vec_id AS VARCHAR))
                    ) TO '{dst_file}' (FORMAT PARQUET)"""
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    if mode == "scramble":
        # rewrite every table with rows in md5-of-row-key order — the
        # file order a 1000-executor writer actually produces is
        # arbitrary, so NO result may depend on it. Certifies the
        # integer-micro/order-independence contract end to end (both
        # engines read the same scrambled file; any query whose value
        # hash moves vs the stock gate was order-dependent).
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src_file}')").fetchall()]
            key = cols[0]
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_file}') "
                f"ORDER BY md5(CAST({key} AS VARCHAR)), {key}) "
                f"TO '{dst_file}' (FORMAT PARQUET)"
            )
        return
    if mode == "dupes":
        dup_map = {t: (key, r) for t, key, r in DUP}
        for t in TABLES:
            src_file = f"{src}/{t}.parquet"
            dst_file = f"{dst}/{t}.parquet"
            if t in dup_map:
                key, r = dup_map[t]
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}') UNION ALL "
                    f"SELECT * FROM read_parquet('{src_file}') WHERE hash({key}) % 20 = {r}) "
                    f"TO '{dst_file}' (FORMAT PARQUET)"
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
                )
        return
    by_table: dict[str, list[tuple[str, str, int]]] = {}
    for t, col, key, r in INJECT:
        by_table.setdefault(t, []).append((col, key, r))
    for t in TABLES:
        src_file = f"{src}/{t}.parquet"
        dst_file = f"{dst}/{t}.parquet"
        mods = by_table.get(t, [])
        if not mods:
            con.execute(f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)")
            continue
        described = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src_file}')").fetchall()
        types = {c[0]: c[1] for c in described}
        cols = [c[0] for c in described]
        mod_map = {col: (key, r) for col, key, r in mods}
        exprs = []
        for c in cols:
            if c in mod_map and (mode == "null" or types[c].upper().startswith("VARCHAR")):
                key, r = mod_map[c]
                repl = "NULL" if mode == "null" else "''"
                exprs.append(
                    f"CASE WHEN hash({key}) % 20 = {r} THEN {repl} ELSE {c} END AS {c}"
                )
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM read_parquet('{src_file}')) TO '{dst_file}' (FORMAT PARQUET)"
        )


def main() -> int:
    args = sys.argv[1:]
    mode = "null"
    if "--empty" in args:
        mode = "empty"
    elif "--dupes" in args:
        mode = "dupes"
    elif "--scramble" in args:
        mode = "scramble"
    elif "--unicode" in args:
        mode = "unicode"
    elif "--longdocs" in args:
        mode = "longdocs"
    elif "--negatives" in args:
        mode = "negatives"
    elif "--tsextremes" in args:
        mode = "tsextremes"
    elif "--badjson" in args:
        mode = "badjson"
    elif "--skewhot" in args:
        mode = "skewhot"
    args = [
        a
        for a in args
        if a
        not in (
            "--empty",
            "--dupes",
            "--scramble",
            "--unicode",
            "--longdocs",
            "--negatives",
            "--tsextremes",
            "--badjson",
            "--skewhot",
        )
    ]
    src = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    filters = args[1:] if args and os.path.isdir(args[0]) else args
    # per-process dir: concurrent sweeps of the SAME family (e.g. an
    # sf0.001 chain and an sf0.1 chain) must not rebuild each other's
    # copy mid-gate; removed on exit (same rationale as scratch_path).
    dst = f"/tmp/spark_graft_sf{mode}_{os.getpid()}"
    build_nulled_dir(src, dst, mode)
    print(f"{mode}-injected copy of {src} at {dst}; running gate...", flush=True)
    cmd = [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), dst, *filters]
    try:
        return subprocess.call(cmd)
    finally:
        import shutil

        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
