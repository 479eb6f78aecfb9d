"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf=0.01, comparing row count, column names, and an
order-insensitive value hash (floats normalized via repr of rounded value).

The DuckDB side is fetched via **Arrow** (``fetch_arrow_table``), not
``fetchall()``: DuckDB widens some integer aggregates to HUGEINT (e.g.
``list_sum`` / ``sum`` over BIGINT), which crosses Arrow as
``decimal128(38,0)`` and surfaces as ``decimal.Decimal`` — the driver's
normalization sees that as distinct from Spark's LONG.  ``fetchall()``
yields plain Python ints and silently masked exactly that asymmetry for
two rounds (``q_embedding_quantize``, CORRECTNESS_r04/r05); with the
Arrow path plus the strict ``Decimal`` marker in ``_norm_cell`` the
mismatch reproduces locally.

Usage:
    python tools/verify_local.py [name ...]
    python tools/verify_local.py --changed-since <git-rev>

``--changed-since`` makes the "changed after last green row" discipline
MECHANICAL: it fingerprints every registered query (the query function's
source + its oracle SQL) in the working tree AND in ``<git-rev>`` (via
``git archive`` into a temp dir), then verifies exactly the
changed/added set at ALL THREE scale factors (sf0.001/0.01/0.1).  Any
query it reports belongs in ``queries/__init__._FORCE_FRONT`` until the
driver re-confirms it.  Limitation (by design): the fingerprint covers
the query function and oracle text, not transitively-called operator
code — after editing ``operators/``/``sinks.py`` internals, run the
full registry instead.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm_cell(v):
    import datetime
    import decimal
    import math
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT folded into int/float: a Decimal here means the
        # engine emitted a decimal type (DuckDB HUGEINT→decimal128, or a
        # Spark DecimalType) and the driver's hash treats it as distinct.
        return "DEC:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def result_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


_FP_SNIPPET = r"""
import hashlib, inspect, json, sys
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as e
qs, oracles = e.queries(), e.oracle_sql()
h = lambda s: hashlib.sha256(s.encode()).hexdigest()
out = {}
for name, fn in qs.items():
    # registry entries are tune()-wrapping closures whose own source is
    # identical for every query — fingerprint the REAL body via
    # __wrapped__.  Revs predating __wrapped__ report src=None and the
    # comparison falls back to the oracle fingerprint alone.
    target = inspect.unwrap(fn)
    if target is fn:
        src = None
    else:
        try:
            src = h(inspect.getsource(target))
        except (OSError, TypeError):
            src = h(repr(target))
    out[name] = {"src": src, "oracle": h(oracles.get(name, ""))}
print(json.dumps(out))
"""


def _fingerprints(tree: str) -> dict[str, str]:
    """Per-query sha256(function source + oracle SQL) computed in a
    SUBPROCESS rooted at ``tree`` — each tree imports its own registry."""
    import json as _json
    import subprocess
    r = subprocess.run([sys.executable, "-c", _FP_SNIPPET, tree],
                       capture_output=True, text=True, cwd=tree)
    if r.returncode != 0:
        raise RuntimeError(f"fingerprinting {tree} failed:\n{r.stderr}")
    return _json.loads(r.stdout.strip().splitlines()[-1])


def changed_since(rev: str) -> list[str]:
    """Names of queries whose function source or oracle changed (or that
    are new) relative to ``rev``."""
    import io
    import subprocess
    import tarfile
    import tempfile
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="verify_rev_") as old_tree:
        # list args + Python tarfile: no shell word-splitting on revs
        # like 'HEAD@{2 days ago}', and git's OWN exit status is checked
        # (a shell pipeline only surfaces tar's)
        ar = subprocess.run(["git", "-C", repo, "archive", rev],
                            capture_output=True, check=True)
        with tarfile.open(fileobj=io.BytesIO(ar.stdout)) as tf:
            tf.extractall(old_tree)
        old_fp = _fingerprints(old_tree)
    new_fp = _fingerprints(repo)
    changed = []
    for n, fp in new_fp.items():
        old = old_fp.get(n)
        if old is None:  # new query
            changed.append(n)
        elif old["oracle"] != fp["oracle"]:
            changed.append(n)
        elif old["src"] is not None and old["src"] != fp["src"]:
            changed.append(n)
    return sorted(changed)


def main(only: list[str], sf_dir: str = SF_DIR) -> int:
    from datalake_ingestion_system_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        # The DRIVER's canonicalizer sorts rows with pandas and crashes on
        # array/map/struct cells — fail locally so it can't reach CI.
        from pyspark.sql.types import ArrayType, MapType, StructType
        complex_cols = [f.name for f in sdf.schema.fields
                        if isinstance(f.dataType, (ArrayType, MapType,
                                                   StructType))]
        if complex_cols:
            print(f"FAIL  {name}: non-scalar output columns {complex_cols} "
                  "(driver canonicalizer cannot sort these)")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = list(tbl.column_names)
            drows = [tuple(rec[c] for c in dcols) for rec in tbl.to_pylist()]
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh = result_digest(scols, [tuple(r) for r in srows])
            dh = result_digest(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                srt = sorted("|".join(_norm_cell(v) for v in r) for r in
                             [tuple(r[scols.index(c)] for c in sorted(scols)) for r in srows])
                drt = sorted("|".join(_norm_cell(v) for v in r) for r in
                             [tuple(r[dcols.index(c)] for c in sorted(dcols)) for r in drows])
                diffs = [(a, b) for a, b in zip(srt, drt) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark: {a}\n   duck : {b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            vac = ("  ** VACUOUS (0 rows both sides — verifies nothing; "
                   "widen the predicate) **" if not srows else "")
            print(f"PASS  {name}: {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]{vac}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail "
          f"/ {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--changed-since":
        if len(argv) != 2:
            raise SystemExit("usage: verify_local.py --changed-since <rev>")
        names = changed_since(argv[1])
        if not names:
            print(f"no query/oracle source changed since {argv[1]}")
            raise SystemExit(0)
        print(f"changed since {argv[1]}: {names}")
        rc = 0
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            print(f"\n== {sf} ==")
            rc |= main(names, f"/root/testdata/{sf}")
        raise SystemExit(rc)
    raise SystemExit(main(argv))
