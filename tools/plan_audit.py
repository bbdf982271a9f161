"""Plan-quality audit over every contract query: the ".explain and
iterate" loop as a regression guard.

For each batch entry in __spark_entry__.queries() the physical plan is
inspected (never executed) and scored for scale antipatterns:

- cartesian / broadcast-nested-loop joins (all-pairs blowups)
- unpartitioned Window over non-sketch inputs (single-reducer sort)
- row-at-a-time Python eval (BatchEvalPython) — Arrow paths are fine
- Exchange count (shuffles) and Python-stage count, printed for trend
  tracking round over round

Streaming replay queries execute work inside the query builder, so they
are audited separately through their pure transformation plans in
pytest (tests assert watermark + stateful-operator shape) and skipped
here. A small allowlist documents deliberate exceptions (the exact
similarity baseline's crossJoin; sketch-sized global windows).

Usage: python tools/plan_audit.py [names...]   (exit 1 on new findings)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose builder runs a streaming replay (executes work) or drives
# non-plan side effects — audited in pytest instead
SKIP = {
    "flow_stream", "session_stream", "rollup_stream", "hll_stream",
    "cms_stream", "hdr_stream", "quality_stream", "dedup_stream",
    "pit_stream", "ffill_stream", "profile_stream", "drift_stream",
    "dsir_stream",
    "pcap_roundtrip",
    # driver-loop learner: one collect per merge iteration by design;
    # rewrite-plan shape asserted in tests/test_bpe.py instead
    "bpe_merges", "bpe_encode", "bpe_roundtrip",
}

# deliberate, documented exceptions: query -> allowed flags
ALLOW = {
    # exact cosine baseline (queries x corpus) — Spark plans the crossJoin
    # as BroadcastNestedLoopJoin; the ANN paths are the scale story
    "similarity_topk": {"cartesian", "bnlj"},
    # groups x broadcast(tiny probe table) by design (sketch estimate read)
    "cms_counts": {"cartesian", "bnlj"},
    # scalar/sketch-sized global windows (HDR cutoff over ~100 histogram
    # buckets): single partition over sketch-sized data by design
    "corpus_clean": {"global_window"},
    "hdr_quantiles": {"global_window"},
    # rank window over the k rows surviving TakeOrderedAndProject
    "vocab_topk": {"global_window"},
    # inherits vocab_topk's k-row rank window (vocab build feeding the
    # broadcast tokenizer join)
    "tokenize": {"global_window"},
    # O(sources) counts x broadcast(single-row totals): the rate table
    # build is sketch-sized by construction; the corpus itself only sees
    # a broadcast hash join + pushable filter
    "temperature_mix": {"bnlj"},
    # posting table x broadcast(single-row corpus totals): the crossJoin
    # side is 1 row by construction (count/sum over the corpus); the
    # corpus-sized side only sees explode + pushed isin filter
    "tfidf_search": {"bnlj"},
    "bm25_search": {"bnlj"},
    # B-row ratio table x broadcast(single-row corpus totals): Catalyst
    # folds the constant join key to a trivial condition and plans BNL
    # over 256 x 1 rows; the corpus-sized gram side only ever meets a
    # broadcast HASH join on the bucket id
    "dsir_weights": {"bnlj"},
    # generic-id mode dense-ranks the ids-only projection (one narrow
    # global sort, the q_ann_ivf seed trade); dense_ids=True is the
    # rank-free scale path and is equality-tested against this one
    "negative_samples": {"global_window"},
    # RRF fuses two ALREADY k-bounded top-k lists (<= ~30 rows): the
    # single-query rank windows + the bm25 single-row totals BNL are all
    # sketch-sized by construction
    "hybrid_search": {"global_window", "bnlj"},
    # ADC is BY DESIGN a map-only scan of the byte-code table with the
    # query batch broadcast (memory-bound ANN): broadcast(queries) x
    # codes with a != condition plans as BNL; each pair costs m array
    # lookups, never a d-dim dot. Compose with IVF lists to prune.
    "pq_adc": {"bnlj"},
}

_PY_STAGES = ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython")


def audit_plan(plan: str) -> tuple[set[str], int, int]:
    flags: set[str] = set()
    if "CartesianProduct" in plan:
        flags.add("cartesian")
    if "BroadcastNestedLoopJoin" in plan:
        flags.add("bnlj")
    if "BatchEvalPython" in plan:
        flags.add("row_python")
    # windowspecdefinition(part..., order..., specifiedwindowframe(...)):
    # partition columns print bare, order columns carry ASC/DESC. A spec
    # with no direction-free argument before the frame has NO partition
    # columns -> all rows move to one task (the WindowExec warning).
    for spec in re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    ):
        args = [a.strip() for a in spec.split(",") if a.strip()]
        if not any(
            a and " ASC" not in a and " DESC" not in a and "(" not in a
            for a in args
        ):
            flags.add("global_window")
            break
    exchanges = plan.count("Exchange ")
    py = sum(plan.count(s) for s in _PY_STAGES)
    return flags, exchanges, py


def main() -> int:
    from rustiflow_spark.session import get_spark
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-audit", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = sys.argv[1:] or [n for n in qs if n not in SKIP]
    failures = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        flags, exchanges, py = audit_plan(plan)
        new = flags - ALLOW.get(name, set())
        status = "FLAG " + ",".join(sorted(new)) if new else "ok"
        allowed = sorted(flags & ALLOW.get(name, set()))
        extra = f" (allowed: {','.join(allowed)})" if allowed else ""
        print(f"{name}: {status}  exchanges={exchanges} py_stages={py}{extra}")
        if new:
            failures += 1
    print(f"\n{failures} flagged / {len(names)} audited")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
