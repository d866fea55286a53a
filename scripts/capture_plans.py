"""Capture annotated physical plans (``explain("formatted")``) for the
headline operators into PLANS.md — the ".explain and iterate" evidence
in reviewable form.

tests/test_plans.py asserts the load-bearing plan properties as
regression gates (pushdown, pruning, broadcast, partial aggregation,
codegen); this script renders the plans themselves so a reviewer can
read what those gates pin without running Spark. Plans are captured at
sf0.001 under the bench session confs (plan SHAPE is data-independent;
AQE stays ON here as in bench so the committed text is what production
runs).

    python scripts/capture_plans.py          # rewrites PLANS.md
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_GRAFT_SKIP_ORACLE_DUMP"] = "1"

from dnscrawler_spark.plans import explain_str  # noqa: E402
from dnscrawler_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

# (query key, what to read in the plan)
PICKS = [
    (
        "q1_pricing_summary",
        "Filter is PUSHED to the parquet scan (PushedFilters on "
        "l_shipdate) and ReadSchema carries only the 6 referenced "
        "columns of the 16-column table; the aggregation runs as "
        "partial HashAggregate -> exchange on the group keys -> final "
        "HashAggregate (map-side combine), all inside WholeStageCodegen.",
    ),
    (
        "j1_broadcast_join",
        "The small dimension side becomes a BroadcastExchange / "
        "BroadcastHashJoin: the ONLY exchange in the plan is the "
        "BroadcastExchange of the filtered small side — the big side "
        "is never shuffled.",
    ),
    (
        "j3_anti_join",
        "Already-crawled exclusion as a broadcast ANTI join — no "
        "shuffle of the probe side, no sort; at cluster scale the "
        "seen-filter tiers (operators/seen.py) replace the broadcast "
        "with the sharded bloom+cuckoo pass, same semantics.",
    ),
    (
        "dedup_minhash_lsh",
        "MinHash+LSH: the signature computation is ONE aggregation "
        "(partial_min map-side combine over un-exploded tokens, plan "
        "nodes 4-6), and candidate pairs come from an EQUALITY join on "
        "the band-bucket key — never a CartesianProduct. At this sf the "
        "bucket side fits Spark's broadcast threshold so the join "
        "broadcasts; at scale it degrades gracefully to a hash-"
        "partitioned shuffle join on the same key (the property "
        "test_plans-gated is equality-join, not broadcast).",
    ),
    (
        "dedup_jaccard_pairs",
        "N-gram Jaccard near-dup pairs via an inverted index: shingles "
        "are exploded then aggregated per doc (two-phase HashAggregate), "
        "the posting list is capped by the max_postings stop-shingle "
        "filter (the Filter over the shingle-count aggregate), and "
        "candidate pairs come from an EQUALITY join on the shingle key "
        "— the plan is joins + hash aggregations only, no "
        "CartesianProduct. The BroadcastHashJoins reflect sf0.001 side "
        "sizes; past the broadcast threshold they become "
        "hash-partitioned shuffle joins on the same keys.",
    ),
    (
        "sim_cosine_topk",
        "Brute-force cosine top-k baseline: the query side is "
        "broadcast (BroadcastNestedLoopJoin whose build side is the k "
        "query rows — cost bounded by k x corpus scores, never corpus "
        "x corpus), dot products stay in Catalyst, and the per-query "
        "top-k runs as WindowGroupLimit — Spark pushes a partial top-k "
        "below the exchange (map-side group limit), so no node ever "
        "sorts the full score stream.",
    ),
    (
        "sim_ivf_topk",
        "IVF ANN top-k: corpus-side cluster assignment is a single "
        "codegen'd projection over LITERAL centroid vectors (no "
        "shuffle, no Python — the quantizer ships inside the plan like "
        "a trained faiss index), queries re-rank only their n_probe "
        "nearest lists via an EQUALITY broadcast join on list_id — "
        "never a nested-loop join like the brute-force baseline — and "
        "the only exchange is the per-query top-k window.",
    ),
    (
        "mm_phash_near_dup",
        "Image pHash near-dedup: pigeonhole chunk blocking turns the "
        "all-pairs hamming scan into an EQUALITY join on (chunk, ck) — "
        "no CartesianProduct / BroadcastNestedLoopJoin anywhere — and "
        "the hamming distance itself is bit_count(xor) inside "
        "WholeStageCodegen, zero Python. At 10^10 images the join is "
        "key-partitioned with n x n_chunks rows per side; the "
        "broadcast at this sf degrades to a hash-partitioned shuffle "
        "join on the same key past the threshold.",
    ),
    (
        "w2_priority_window",
        "Priority-queue admission: ONE exchange on the partition key, "
        "and the rank-then-filter appears as WindowGroupLimit both "
        "below and above it — Spark's map-side partial top-k, so each "
        "input partition forwards at most k rows per key into the "
        "shuffle (the two-phase top-k politeness.py implements by hand "
        "under salting, here recognized by Catalyst).",
    ),
    (
        "text_quality",
        "Text quality scoring is pure Catalyst column algebra over the "
        "documents scan — one WholeStageCodegen span, zero exchanges, "
        "zero Python; ReadSchema is pruned to the referenced columns.",
    ),
]

HEADER = """\
# PLANS — captured physical plans for the headline operators

Generated by `scripts/capture_plans.py` (sf0.001, bench session confs,
pyspark 4.1.2). Each entry shows `explain("formatted")` plus what to
read in it; tests/test_plans.py asserts these properties as regression
gates so the text below cannot silently rot. The crawl round's plans
are not capturable as one static DataFrame (they are built per round);
their plan properties are gated live instead — politeness partition
reuse and dedup-without-Window in test_plans.py, per-round job/collect
counts in test_round_jobs.py.
"""


def trim(plan: str, max_lines: int = 120) -> str:
    """Drop the codegen-id noise and cap very long plans."""
    lines = [re.sub(r"\s+$", "", l) for l in plan.splitlines()]
    if len(lines) > max_lines:
        lines = lines[:max_lines] + [f"... ({len(lines) - max_lines} more lines)"]
    return "\n".join(lines)


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

    spark = get_spark(app_name="capture_plans", master="local[4]")
    out = [HEADER]
    for key, note in PICKS:
        df = qs[key](spark, SF)
        plan = trim(explain_str(df, "formatted"))
        out.append(f"\n## {key}\n\n{note}\n\n```\n{plan}\n```\n")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path} ({len(PICKS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
