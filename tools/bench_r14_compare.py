#!/usr/bin/env python3
"""r14 optimization-round bench comparison.

Compares bench_runs/r14/ (post-optimization quiet runs) against
bench_runs/r14pre/ (pre-optimization quiet runs taken at round start
from a pristine HEAD worktree), per entry, best-of-N each, both at
sf0.1 / local[8]. As in r13's tool, a load-normalized view divides by
the median post/pre ratio over UNTOUCHED entries (ambient co-tenancy
estimate); with both batches taken on the same box in the same session
the factor should sit near 1.0.
"""
import json, glob, statistics, sys

TOUCHED = {
    # de-skewed df/multiplicity aggregations + fault-tolerant persists
    "dedup_ngram_jaccard", "dedup_containment", "dedup_minhash",
    "dedup_simhash", "dedup_span_removal", "dedup_threshold_sweep",
    "dedup_clusters", "dedup_apply", "lake_pipeline_compose",
    "text_tfidf", "text_bm25", "text_dup_spans",
    # persist conversions (token streams / fact legs)
    "text_nb_quality", "quality_auc", "text_unigram_lp",
    "text_ppl_buckets", "text_bigram_lp", "sample_importance",
    "corpus_divergence", "text_lr_quality", "q21_waiting",
    "search_hybrid_rrf",
    # drain / commit-count changes
    "stream_changelog", "stream_file_cap", "stream_ann_sync",
    "stream_cdc_apply",
    # ANN build changes (round item 5)
    "ann_ivfpq", "ann_ivfpq_persisted", "mine_hard_negatives_indexed",
    # lake compaction (round item 6)
    "lake_compact", "lake_autocompact",
}


def agg(pattern):
    runs = [json.load(open(f)) for f in sorted(glob.glob(pattern))]
    qs = {}
    for r in runs:
        for k, v in r["queries"].items():
            qs.setdefault(k, []).append(v)
    return len(runs), {k: min(v) for k, v in qs.items()}


def main():
    n_pre, pre = agg("bench_runs/r14pre/*.json")
    n_post, post = agg("bench_runs/r14/*.json")
    common = sorted(set(pre) & set(post))
    untouched = [k for k in common if k not in TOUCHED]
    infl = statistics.median(post[k] / pre[k] for k in untouched)
    print(f"pre runs: {n_pre}  post runs: {n_post}  common entries: {len(common)}")
    print(f"sum pre(best-of-{n_pre}): {sum(pre[k] for k in common):.1f}s  "
          f"sum post(best-of-{n_post}): {sum(post[k] for k in common):.1f}s")
    print(f"machine inflation (median post/pre over {len(untouched)} untouched): {infl:.2f}x")
    g = statistics.geometric_mean(
        [post[k] / pre[k] for k in common])
    gt = statistics.geometric_mean(
        [post[k] / pre[k] for k in common if k in TOUCHED])
    print(f"geomean post/pre all: {g:.3f}   touched only: {gt:.3f}")
    print(f"\n{'entry':30s} {'pre':>7s} {'post':>7s} {'ratio':>6s} {'norm':>6s}")
    rows = sorted(common, key=lambda k: post[k] / pre[k])
    for k in rows:
        r = post[k] / pre[k]
        mark = " *" if k in TOUCHED else ""
        if "-v" in sys.argv or k in TOUCHED or r / infl > 1.5 or r / infl < 0.67:
            print(f"{k:30s} {pre[k]:7.2f} {post[k]:7.2f} {r:6.2f} {r/infl:6.2f}{mark}")
    # regression gate: touched entries slower than 1.5x normalized AND >0.3s
    bad = [k for k in common
           if post[k] / pre[k] / infl > 1.5 and post[k] - pre[k] > 0.3]
    print(f"\nregression gate (>1.5x norm and >0.3s): {bad or 'EMPTY'}")


if __name__ == "__main__":
    main()
