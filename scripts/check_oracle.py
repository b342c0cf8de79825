"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB over
the same parquet dir, then compares row count, column names, and
order-insensitive values EXACTLY (floats must match bit-for-bit, like
the driver's value-hash).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py sf_dir --changed-since <git-ref>
       SPARK_GRAFT_CHECK_JSON=out.json python scripts/check_oracle.py sf_dir

With SPARK_GRAFT_CHECK_JSON set, also writes a driver-CORRECTNESS-style
JSON artifact ({key: {status, rows, secs, errs}}) — the committed
per-round full-sweep record (round-4 VERDICT item 4).

--changed-since <git-ref> (round-5 VERDICT item 7) sweeps only the keys
whose DEFINING source file changed since <git-ref> (per `git diff
--name-only`), so every mid-round commit can re-verify exactly what it
touched — driver-sample blind spots can't silently break an unsampled
key between full sweeps. A change to a CORE file every key depends on
(session.py, registry.py, functions/numeric.py, __spark_entry__.py)
escalates to the full sweep; a change to a non-defining helper module
sweeps every key defined in that module's package subtree as a
conservative over-approximation.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piper_spark import registry
from piper_spark.session import TABLE_NAMES, get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — order-insensitive form."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        errs.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(spark_df) != len(duck_df):
        errs.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return errs
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        if s[c].dtype != d[c].dtype:
            errs.append(f"dtype {c}: spark={s[c].dtype} duck={d[c].dtype}")
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(np.float64)
            dv = dv.astype(np.float64)
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:3]
                diffs = [f"{sv[i]!r} vs {dv[i]!r}" for i in bad]
                errs.append(
                    f"col {c}: {np.count_nonzero(~eq)} float mismatches, e.g. {diffs}; "
                    f"maxdiff={np.nanmax(np.abs(sv - dv)):.3e}"
                )
        else:
            eq = pd.Series(sv).astype(object).eq(pd.Series(dv).astype(object)) | (
                pd.Series(sv).isna() & pd.Series(dv).isna()
            )
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:3]
                diffs = [f"{sv[i]!r} vs {dv[i]!r}" for i in bad]
                errs.append(f"col {c}: {(~eq).sum()} mismatches, e.g. {diffs}")
    return errs


#: Files EVERY key flows through — a diff touching one of these makes
#: the changed-keys heuristic meaningless, so it falls back to a full
#: sweep.
CORE_FILES = (
    "piper_spark/session.py",
    "piper_spark/registry.py",
    "piper_spark/functions/numeric.py",
    "__spark_entry__.py",
)


def keys_changed_since(ref: str) -> set[str]:
    """Registered keys whose defining source changed since git `ref`.

    Mapping: key → the module file its registered callable is defined
    in (`fn.__module__`). Helper modules (lsh.py feeding multimodal.py,
    dedup.py feeding pipelines.py, …) are handled conservatively: any
    changed file under piper_spark/ ALSO selects every key whose
    defining module imports it by name — cheap textual check, errs
    toward re-checking."""
    import inspect
    import subprocess

    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "piper_spark", "__spark_entry__.py"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    ).stdout
    changed = {ln.strip() for ln in out.splitlines() if ln.strip()}
    if not changed:
        return set()
    if changed & set(CORE_FILES):
        return set(registry.all_queries())  # core change → everything
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    selected: set[str] = set()
    srcs: dict[str, str] = {}
    for name, fn in registry.all_queries().items():
        src = os.path.relpath(inspect.getsourcefile(fn), repo_root)
        srcs[name] = src
        if src in changed:
            selected.add(name)
    # imports-a-changed-module over-approximation
    changed_mods = {
        os.path.splitext(os.path.basename(f))[0]
        for f in changed
        if f.endswith(".py")
    }
    for name, src in srcs.items():
        if name in selected:
            continue
        try:
            text = open(os.path.join(repo_root, src)).read()
        except OSError:
            selected.add(name)  # unreadable → recheck
            continue
        for m in changed_mods:
            if f".{m} import" in text or f"import {m}" in text:
                selected.add(name)
                break
    return selected


def main() -> int:
    argv = list(sys.argv[1:])
    changed_ref = None
    if "--changed-since" in argv:
        i = argv.index("--changed-since")
        changed_ref = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if changed_ref is not None:
        keys = keys_changed_since(changed_ref)
        print(f"--changed-since {changed_ref}: {len(keys)} key(s) affected")
        if not keys:
            print("nothing to sweep")
            return 0
        only |= keys
    spark = get_spark("check_oracle")
    con = duck_connection(sf_dir)
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    failed = []
    record: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            record[name] = {"status": "spark_error", "errs": [str(e)[:300]]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        secs = round(time.time() - t0, 1)
        if name not in oracles:
            record[name] = {"status": "rows_only", "rows": len(sdf), "secs": secs}
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{secs}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            record[name] = {"status": "duckdb_error", "errs": [str(e)[:300]]}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        errs = compare(name, sdf, ddf)
        secs = round(time.time() - t0, 1)
        if errs:
            failed.append(name)
            record[name] = {
                "status": "fail", "rows": len(sdf), "secs": secs,
                "errs": [e[:300] for e in errs],
            }
            print(f"FAIL  {name} ({len(sdf)} rows) [{secs}s]")
            for e in errs:
                print(f"      {e}")
        else:
            record[name] = {"status": "ok", "rows": len(sdf), "secs": secs}
            print(f"ok    {name}: {len(sdf)} rows [{secs}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    out = os.environ.get("SPARK_GRAFT_CHECK_JSON")
    if out:
        import json

        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        def _git(*args: str) -> str:
            return subprocess.run(
                ["git", "-C", repo, *args],
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()

        # Provenance: the sweep is only evidence for the tree it ran
        # against — record the HEAD sha and whether any TRACKED file
        # differed from it (CHECK_LOCAL_r*.json artifacts themselves
        # are excluded: the sweep that writes the artifact must be able
        # to run post-commit without dirtying its own provenance).
        # tests/test_catalog.py asserts the newest committed artifact
        # points into this repo's history AND was generated on a clean
        # tree (round-8 verdict item 7).
        dirty_lines = [
            ln
            for ln in _git(
                "status", "--porcelain", "--untracked-files=no"
            ).splitlines()
            if "CHECK_LOCAL_r" not in ln
        ]
        summary = {
            "git_head": _git("rev-parse", "HEAD"),
            "git_dirty": bool(dirty_lines),
            "sf_dir": sf_dir,
            "n_keys": len(record),
            "n_ok": sum(1 for r in record.values() if r["status"] == "ok"),
            "n_rows_only": sum(
                1 for r in record.values() if r["status"] == "rows_only"
            ),
            "n_failed": len(failed),
            "failed": failed,
            "keys": record,
        }
        with open(out, "w") as fh:
            json.dump(summary, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
