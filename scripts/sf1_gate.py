#!/usr/bin/env python3
"""sf1 correctness spot-gate (r5 verdict #8).

All per-round hash-compares run at sf0.01/sf0.1; nothing proved the hash
contract is SF-independent at the next decade. This script replays the
driver's DuckDB compare for the most expensive ORACLE-GATED queries against
a 10x-sf0.1 ("sf1-scale") dataset produced by graft.ScaleDrill.materialize
(key-shifted copies; text perturbed so near-dup structure stays
scale-invariant -- see ScaleDrill scaladoc).

Usage:
  1) sbt 'runMain graft.DrillPrep /root/testdata/sf0.1 /tmp/graft_sf1 10'
     (writes /tmp/graft_sf1/base1x and /tmp/graft_sf1/scaled; the gate
      runs against the scaled copy)
  2) sbt 'runMain graft.Verify /tmp/graft_sf1/scaled /tmp/vout_sf1 <q1,q2,...>'
  3) python3 scripts/sf1_gate.py /tmp/graft_sf1/scaled /tmp/vout_sf1 CORRECTNESS_sf1.json

Compare contract mirrors the driver: columns sorted by name, rows sorted,
doubles rounded to 4 decimals, value-hash equality.
"""
import datetime
import decimal
import hashlib
import json
import math
import os
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def views(con, sf1dir):
    for t in TABLES:
        src = f"{sf1dir}/{t}.parquet/*.parquet"
        if t == "events":
            # ScaleDrill writes ts as bigint epoch-nanos (Spark reads the
            # source INT64 TIMESTAMP(NANOS) with nanosAsLong); rebuild the
            # TIMESTAMP_NS the oracle SQL expects. Lossless: the generated
            # data has no sub-microsecond component (checked upstream).
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE "
                f"(CAST('1970-01-01' AS TIMESTAMP_NS) + "
                f"INTERVAL (ts // 1000) MICROSECOND AS ts) FROM '{src}'")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.4f}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.4f}"
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = sorted(tuple(norm_cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return cols, rows


def main():
    sf1dir, voutdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]

    # ONE CONNECTION PER QUERY (r19): a single long-lived connection
    # accumulates buffer-pool pressure across 344 heavy oracles and starts
    # flapping "failed to allocate" near its limit (73 spurious OOM fails
    # on an otherwise idle machine once the BPE-chain oracles joined the
    # surface). A fresh connection fully releases memory between queries;
    # re-registering ten views costs microseconds. Spill goes to an
    # explicit temp dir so big sorts degrade to disk instead of erroring.
    def fresh_con():
        # r19 ADVICE: close a half-initialized connection if setup dies
        # mid-way (SET/views after connect) — otherwise the retry path
        # leaks a 48GB-limit connection exactly in the low-memory moment
        # the retry exists to survive. Spill dir is pid-scoped so two
        # concurrent gate runs never share (and never cross-delete)
        # spill files.
        c = duckdb.connect()
        try:
            c.execute("SET memory_limit='48GB'")
            c.execute(
                f"SET temp_directory='/tmp/graft_duck_spill_{os.getpid()}'")
            views(c, sf1dir)
        except Exception:
            c.close()
            raise
        return c

    oracle = json.load(open(f"{voutdir}/oracle_sql.json"))
    out = {}
    for name in sorted(oracle):
        # Golden-VALUES oracles are literal snapshots of the engine's
        # sf0.01 output (Goldens.scala) -- by construction SF-BOUND, so
        # replaying them against a 10x dataset would false-fail. Record
        # the exclusion explicitly: the full-surface claim is "every
        # COMPUTED oracle holds at the next decade", and the artifact
        # says which lanes are gated elsewhere (driver gate at sf0.01 +
        # bit-stability across core counts).
        if "FROM (VALUES" in oracle[name]:
            out[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": None,
                         "oracle_rows": None, "err": None,
                         "excluded": "golden-snapshot oracle (sf0.01-bound)"}
            print(name, "excluded: golden snapshot")
            continue
        # connection setup can catch the machine at a bad instant (a just-
        # exited JVM's pages not yet reclaimed); one bounded retry, and any
        # setup failure records as this lane's error instead of killing
        # the remaining lanes
        try:
            con = fresh_con()
        except Exception:  # noqa: BLE001
            time.sleep(10)
            try:
                con = fresh_con()
            except Exception as ex:  # noqa: BLE001
                out[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "err": "conn: " + str(ex)[:280]}
                print(name, None, out[name]["err"])
                continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{voutdir}/{name}/*.parquet'").fetchdf()
            ec, er = canon(exp)
            gc, gr = canon(got)
            schema = [c.lower() for c in ec] == [c.lower() for c in gc]
            rows = len(er) == len(gr)
            h = lambda rs: hashlib.md5(
                "\n".join("\x1f".join(r) for r in rs).encode()).hexdigest()
            out[name] = {
                "rows_match": rows, "schema_match": schema,
                "hash_match": schema and rows and h(er) == h(gr),
                "spark_rows": len(gr), "oracle_rows": len(er), "err": None,
            }
        except Exception as ex:  # noqa: BLE001 - record, keep gating the rest
            out[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": None,
                         "oracle_rows": None, "err": str(ex)[:300]}
        finally:
            con.close()
        print(name, out[name]["hash_match"], out[name].get("err") or "")
    ok = sum(1 for v in out.values() if v["hash_match"])
    excl = sum(1 for v in out.values() if v.get("excluded"))
    gated = len(out) - excl
    # Self-describing staleness (r14 verdict #8): the artifact names the
    # commit it was generated at, so "is the sf1 evidence current?" is a
    # git-log lookup instead of an mtime argument.
    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd="/root/repo",
                              capture_output=True, text=True,
                              check=True).stdout.strip()
    except Exception:  # noqa: BLE001 - meta must never block the gate
        head = "unknown"
    # The RUNTIME-SURFACE commit (last change under src/build.sbt/budgets):
    # artifact-only commits after the stamp (this file, bench recordings,
    # docs) cannot invalidate sf1 evidence, so currency is judged against
    # the code commit, mechanically, in Bench (r17 verdict #6 — equality
    # must not rest on a docs-only-gap argument).
    try:
        code = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--",
             "src", "build.sbt", "scan_budgets.json"],
            cwd="/root/repo", capture_output=True, text=True,
            check=True).stdout.strip()
    except Exception:  # noqa: BLE001
        code = "unknown"
    out["_meta"] = {
        "sf1_head_commit": head,
        "sf1_code_commit": code,
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "sf1_dir": sf1dir, "lanes_gated": gated, "hash_green": ok,
        "excluded": excl,
    }
    json.dump(out, open(outjson, "w"), indent=1)
    print(f"[sf1-gate] {ok}/{gated} hash-green ({excl} golden-snapshot "
          f"exclusions) @ {head[:12]} -> {outjson}")


if __name__ == "__main__":
    main()
