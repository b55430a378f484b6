"""Registry-wide scan-filter plan sweep (round 11) — find every key
whose parquet SCAN DataFilters carry an EXPENSIVE expression.

Why: Catalyst's filter inference (InferFiltersFromGenerate for
explodes, InferFiltersFromConstraints for join/group keys) plus
predicate pushdown can relocate a pipeline's most expensive
expression into the scan, where it is evaluated a SECOND time —
serially on poorly-split files, and on every scan task at any scale.
Round 11 found and fixed the generator class this way
(operators/genutil.py: dedup_minhash_lsh 2.14→1.51s,
dedup_substring_spans, text_span_dedup, the bigram-LM body,
text_contamination).

Not every hit is a defect — the sweep distinguishes:

- GENERATOR DUPLICATION (fixed, must stay zero): an inferred
  size()>0 filter carrying a tokenize/k-gram/md5 generator build.
- SEMANTIC PREDICATES (ACCEPTED below): the expression IS the
  operator's own row filter — md5-gated sampling/assignment
  (sample_quality_resample, ev_power_mde: pushing the gate to the
  scan is exactly right), an explicit token-count gate evaluated
  once more than strictly needed but bounded (bpe_pair_counts), a
  bounded 24-char fold on a join-key null guard
  (text_levenshtein_pairs), and a join-key isnotnull over the
  first-k-token fingerprint (corpus_source_overlap — bounded by the
  slice, InferFiltersFromConstraints has no per-site off switch).

Exit 1 on any hit NOT in ACCEPTED — a regression gate for new keys.

    python scripts/scanfilter_sweep.py [--sf /root/testdata/sf0.001] [keys...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = (
    "zip_with", "array_join", "transform(", "md5(", "translate(",
    "regexp_extract", "aggregate(", "filter(lambdafunction", "sequence(",
)

#: accepted (key, marker) pairs — semantic predicates, documented above
ACCEPTED = {
    ("sample_quality_resample", "md5("),
    ("ev_power_mde", "md5("),
    ("bpe_pair_counts", "translate("),
    ("text_levenshtein_pairs", "translate("),
    ("corpus_source_overlap", "md5("),
    ("corpus_source_overlap", "array_join"),
    ("corpus_source_overlap", "translate("),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from duckdb_hdfs_spark.queries import load_all
    from duckdb_hdfs_spark.session import get_spark

    spark = get_spark("scanfilter-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = [k for k in (args.keys or list(reg)) if k in reg]

    bad, accepted = [], 0
    for i, name in enumerate(keys):
        try:
            plan = (
                reg[name]
                .spark(spark, args.sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            bad.append((name, "PLAN-ERROR", str(e)[:120]))
            continue
        for seg in plan.split("FileScan parquet")[1:]:
            line = seg.splitlines()[0]
            for h in HEAVY:
                if h in line:
                    if (name, h) in ACCEPTED:
                        accepted += 1
                    else:
                        bad.append((name, h, line[:160]))
        if (i + 1) % 50 == 0:
            print(f"# {i + 1}/{len(keys)}", flush=True)

    print(f"{len(keys)} keys swept: {accepted} accepted semantic-predicate "
          f"hits, {len(bad)} UNCLASSIFIED")
    for name, h, line in bad:
        print(f"FAIL {name} [{h}]\n    {line}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
