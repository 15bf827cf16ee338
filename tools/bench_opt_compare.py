#!/usr/bin/env python3
"""r13 optimization-round bench comparison.

Compares bench_runs/r13opt/ (post-optimization quiet runs) against
bench_runs/r13/ (pre-optimization quiet runs from the interrupted build
round) per entry, best-of-N vs best-of-8. Because absolute machine load
differs between the two run batches, it also reports a load-normalized
view: the median post/pre ratio over UNTOUCHED entries estimates the
machine-inflation factor, and touched entries are judged against that
baseline rather than against 1.0.
"""
import json, glob, statistics, sys

TOUCHED = {
    # batch 1
    "dedup_threshold_sweep", "dedup_clusters", "dedup_apply",
    "stream_cdc_apply", "stream_ann_sync",
    # batch 2 (changelog consumers + staging + one-pass checks)
    "stream_changelog", "lake_changelog", "lake_changelog_dv",
    "lake_changes_sql", "lake_matview", "stream_neardup_gate",
    "stream_txn_sink", "stream_file_cap", "lake_incremental",
    # batch 3
    "q2_min_cost", "q15_top_supplier", "q11_important_stock",
    "q17_small_qty", "q21_waiting", "text_tfidf", "text_bm25",
    "text_nb_quality", "quality_auc", "corpus_threshold_sweep",
    "text_bigram_lp", "corpus_divergence", "text_unigram_lp",
    "text_ppl_buckets", "sample_importance", "text_dup_spans",
    "dedup_span_removal", "dedup_ngram_jaccard", "dedup_containment",
    "lake_pipeline_compose",
}

def agg(pattern):
    runs = [json.load(open(f)) for f in sorted(glob.glob(pattern))]
    qs = {}
    for r in runs:
        for k, v in r["queries"].items():
            qs.setdefault(k, []).append(v)
    return len(runs), {k: min(v) for k, v in qs.items()}

def main():
    n_pre, pre = agg("bench_runs/r13/*.json")
    n_post, post = agg("bench_runs/r13opt/*.json")
    common = sorted(set(pre) & set(post))
    untouched = [k for k in common if k not in TOUCHED]
    infl = statistics.median(post[k] / pre[k] for k in untouched)
    print(f"pre runs: {n_pre}  post runs: {n_post}  common entries: {len(common)}")
    print(f"sum pre(best-of-{n_pre}): {sum(pre[k] for k in common):.1f}s  "
          f"sum post(best-of-{n_post}): {sum(post[k] for k in common):.1f}s")
    print(f"machine inflation (median post/pre over {len(untouched)} untouched entries): {infl:.2f}x")
    print(f"\n{'entry':30s} {'pre':>7s} {'post':>7s} {'ratio':>6s} {'norm':>6s}")
    rows = [(k, pre[k], post[k], post[k] / pre[k], post[k] / pre[k] / infl)
            for k in common if k in TOUCHED]
    for k, p, q, r, nr in sorted(rows, key=lambda x: x[4]):
        print(f"{k:30s} {p:7.2f} {q:7.2f} {r:6.2f} {nr:6.2f}")
    tpre = sum(pre[k] for k in TOUCHED if k in pre and k in post)
    tpost = sum(post[k] for k in TOUCHED if k in pre and k in post)
    upre = sum(pre[k] for k in untouched)
    upost = sum(post[k] for k in untouched)
    print(f"\ntouched sum:   {tpre:.1f} -> {tpost:.1f}  ({tpost/tpre:.2f}x raw, {tpost/tpre/infl:.2f}x load-normalized)")
    print(f"untouched sum: {upre:.1f} -> {upost:.1f}  ({upost/upre:.2f}x raw)")
    # regression gate vs pre, load-normalized: >1.5x and >0.3s
    regs = [(k, pre[k], post[k]) for k in common
            if post[k] / infl > 1.5 * pre[k] and post[k] / infl - pre[k] > 0.3]
    print(f"\nload-normalized regression table (>1.5x and >0.3s): "
          f"{'EMPTY' if not regs else ''}")
    for k, p, q in sorted(regs, key=lambda x: -(x[2] - x[1])):
        print(f"  {k:30s} {p:7.2f} -> {q:7.2f} (norm {q/infl:7.2f})")

if __name__ == "__main__":
    main()
