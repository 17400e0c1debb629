"""100x scale probe for the dedup/ANN family.

`tools/scale_test.py 10` is the per-round sweep ceiling; this probe
builds a 100x key-offset replication of sf0.1 (~1.7 GB) and runs ONLY
the dedup/ANN queries one more decade out, to separate replication
artifacts (duplicate-pair mass growing as copies^2 is the banding
working) from real plan superlinearity.

Exclusion, adjudicated: `tfidf_cosine_pairs` cannot run at 100x ON
THIS FIXTURE — the 31-term corpus makes every document genuinely
similar to every other, so the TRUE result at 100x is
Theta((100n)^2) ~ 1e11 pairs; no exact algorithm can materialize its
own output there. That is a fixture artifact (dense ground truth),
not a plan property (the 10x sweep measured the same wall: >75 GB of
shuffle spill); its scale evidence is the sf0.1 bench cost plus the
df-cap/prefix-filter design contract in the operator docstring.

Results land in SCALING_100X.md, which tools/scale_test.py splices
into SCALING.md on regeneration (this tool does the same splice).

Usage: python tools/scale_probe.py [copies]   (default 100)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dfs_w_mapreduce_spark.registry import collect
from dfs_w_mapreduce_spark.session import get_spark
from tools.scale_test import SRC, build

DST100 = "/tmp/spark_graft_sf100x"

# The dedup/ANN family: banded/bucketed candidate generation paths
# whose 100 TB posture the probe certifies.
PROBE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_pairs",
    # round-7: probed once SWEEP_BUCKET_CAP bounded the loose 8x2
    # config's candidate mass (round-6 measured an executor OOM here —
    # ~5e9 pairs by construction; the cap makes the sweep's own
    # evidence scale-safe and reports what it truncated)
    "minhash_band_sweep",
    "dup_ngram_spans",
    "dedup_embedding_pairs_lsh",
    "dedup_embedding_clusters",
    "dedup_clusters_incremental",
    "knn_lsh_bucketed",
    # round-6 extension: the ITERATIVE/curation family — the other
    # plans whose 100 TB behavior a single decade cannot certify
    # (iterative joins with lineage truncation, two-level distributed
    # prefix sums, span-removal corpus rebuild, full curation DAG)
    "graph_pagerank",
    "pack_sequences",
    "dedup_span_apply",
    "pipeline_end_to_end",
    "bpe_train",
    # round-6 additions in the same class: driver-looped iteration
    # (broadcast fan-out + hash-agg argmin per round) and a global
    # range-partitioned sort/rank
    "kmeans_lloyd",
    "shuffle_epochs",
    # the md5-per-position CDC store family: linear by construction,
    # but the constant is the largest in the repo — certify the decade
    "store_gc",
    "placement_rebalance",
    # round-7 iterative/curation additions: R corpus aggregations
    # (perceptron) and one explode + 64-row broadcast + top-K (DSIR).
    # semdedup_prune is NOT probed: its within-cluster self-join is
    # SemDeDup's published quadratic cost with k pinned by the
    # unrolled-CTE oracle contract (the production knob is k ~ n/1000;
    # see the operator docstring).
    "quality_perceptron",
    "importance_resample",
    "dedup_agreement",
    # round-8 extension (verdict ask): the two remaining heavy families
    # — per-row Python codec decode (rows x payload scaling; the only
    # hot path that is honest per-row Python by constraint) and a LIVE
    # micro-batch streaming pipeline against a persisted store (batches
    # x batch-size scaling; fixed per-batch overhead should amortize,
    # per-batch work must track batch rows).
    "multimodal_decode",
    "stream_cdc_store_live",
    # round-9 extension (verdict ask): the exact-pair baselines now run
    # the mass-gated exact-pair core: sum(df^2) here (7e11) blows the
    # count-path budget, so the capped verify branch runs (cap 128,
    # global-hash rank) — these rows certify the cap, not fixture
    # slack (caps 512/1024 measured 1.3e8/5e8-pair verify shuffles and
    # FAILED this probe before the budget-gate redesign). Plus the
    # 3-round label-propagation edge shuffle and the new paragraph-
    # canonicalization hash join.
    # tfidf_cosine_zipf is EXCLUDED for the same by-construction reason
    # as tfidf_cosine_pairs: key-offset replication multiplies every
    # term's df by `copies` WITHOUT growing the vocabulary, so the
    # AllPairs candidate mass is forced toward copies^2 — a replication
    # artifact, not the plan (real corpora grow vocabulary with n).
    # Its scale evidence is tools/tfidf_zipf_probe.py, which scales a
    # Zipf corpus the realistic way (vocabulary grows with n) and
    # appends the measured candidate reduction + crossover to
    # SCALING_100X.md.
    "dedup_ngram_pairs",
    "dedup_containment",
    "graph_label_prop",
    "dedup_paragraph",
    # round-10 extension (verdict ask): the two r9 linear-on-paper
    # newcomers — both explode shingles over the full corpus with
    # 8-byte hashed keys and min/max aggregates — plus the new image
    # perceptual-hash dedup (banded + bucket-capped, the simhash
    # class; fixture hash space is finite so replication grows bucket
    # population — exactly what the cap must absorb).
    "split_leakage",
    "ngram_novelty",
    "dedup_image_phash",
    # pii_audit: single scan + one hash aggregate, linear by
    # construction — probed to pin the regex-heavy scan cost.
    "pii_audit",
    # round-11 extension (verdict ask): the two unprobed round-10 keys —
    # image dup RESOLUTION under its own dense-clique edge distribution
    # (the checkpoint-then-mirror propagation core's heaviest consumer)
    # and the linear-on-paper fingerprint build (frames x FP_FANOUT
    # bound under 100-copy identical-audio replication) — plus the new
    # lookup (probe-vs-index hash join whose fan-out is the thing to
    # certify: replication multiplies BOTH sides of every fp_hash
    # bucket) and the graph-ANN beam search (fixed-round iterative
    # joins against a 100x graph).
    "dedup_image_clusters",
    "multimodal_audio_fingerprint",
    "multimodal_audio_fp_lookup",
    "knn_graph_search",
]


# Restart the JVM every N probe queries: a 26-query 100x marathon in
# ONE session accumulated heap (checkpoint blocks, shuffle state,
# codegen classes) until query #25 OOM'd an 8g driver — and a poisoned
# JVM fails every later query collaterally (CLAUDE.md). Fresh sessions
# every few queries keep each measurement independent, which is also
# truer to how the per-query numbers are adjudicated.
SESSION_ROTATE_EVERY = 6


def run(sf_dir: str, label: str) -> dict[str, tuple[float, int]]:
    """Time each probe query AND record its output row count (the
    output-mass yardstick) via an Observation on the same noop-write
    job — zero extra compute, so 'ratio vs output mass' is a measured
    column, not an adjudication narrative."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    reg = collect()
    spark = get_spark("scale_probe")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, tuple[float, int]] = {}
    for i, name in enumerate(PROBE_QUERIES):
        if i and i % SESSION_ROTATE_EVERY == 0:
            spark.stop()
            spark = get_spark("scale_probe")
            spark.read.parquet(f"{sf_dir}/documents.parquet").write.format(
                "noop"
            ).mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            obs = Observation()
            reg[name].fn(spark, sf_dir).observe(
                obs, F.count(F.lit(1)).alias("rows")
            ).write.format("noop").mode("overwrite").save()
            out[name] = (round(time.perf_counter() - t0, 2), int(obs.get["rows"]))
        except Exception as e:  # record the failure, keep probing
            out[name] = (float("nan"), -1)
            print(f"  {label} {name}: FAILED {type(e).__name__}", flush=True)
            continue
        print(f"  {label} {name}: {out[name][0]}s rows={out[name][1]}", flush=True)
    return out


def splice_into_scaling(section: str) -> None:
    """Replace/append the 100x section of SCALING.md (which
    tools/scale_test.py otherwise regenerates from scratch)."""
    path = os.path.join(_REPO, "SCALING.md")
    marker = "## 100x probe"
    if os.path.exists(path):
        base = open(path).read()
        cut = base.find(marker)
        if cut != -1:
            base = base[:cut].rstrip() + "\n"
    else:
        base = ""
    with open(path, "w") as f:
        f.write(base.rstrip() + "\n\n" + section)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    # SPARK_GRAFT_PROBE_ONLY=a,b,c: re-probe a subset (fresh session,
    # the rerun-twice rule for OOM-class fixes) WITHOUT rewriting the
    # md — results print only.
    only = [q for q in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if q]
    if only:
        unknown = set(only) - set(PROBE_QUERIES)
        assert not unknown, f"unknown probe queries: {sorted(unknown)}"
        PROBE_QUERIES[:] = only
    spark = get_spark("scale_probe")
    import tools.scale_test as st

    st.DST = DST100  # build into the probe dir, not the 10x dir
    if os.environ.get("SPARK_GRAFT_PROBE_REUSE") and os.path.isdir(DST100):
        print(f"reusing existing {DST100}", flush=True)
    else:
        print(f"building {copies}x fixtures in {DST100} ...", flush=True)
        t0 = time.perf_counter()
        build(spark, copies)
        print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)

    base = run(SRC, "sf0.1")
    big = run(DST100, f"sf0.1x{copies}")

    lines = [
        f"## 100x probe (dedup/ANN family, tools/scale_probe.py, {copies}x)",
        "",
        "One more decade beyond the 10x sweep, dedup/ANN only. Replication",
        "multiplies the duplicate-pair MASS as copies^2 (every copy of a doc",
        "duplicates every other copy), so the fair linearity yardstick for",
        "pair-emitting rows is the OUTPUT mass, not the input rows — now a",
        "MEASURED column (`rows` via an Observation on the same job): a time",
        "ratio at or below max(data ratio, output-mass ratio) certifies the",
        "candidate machinery tracks corpus size, not its square.",
        "",
        f"| query | sf0.1 (s) | rows | x{copies} (s) | rows | time ratio | output ratio | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in PROBE_QUERIES:
        b0, r0 = base.get(name, (float("nan"), -1))
        b1, r1 = big.get(name, (float("nan"), -1))
        if b0 != b0 or b1 != b1 or not b0:  # NaN or zero base
            lines.append(f"| {name} | {b0} | {r0} | {b1} | {r1} | FAILED | — | FAILED |")
            continue
        tr = b1 / b0
        orr = (r1 / r0) if r0 > 0 else float("nan")
        yardstick = max(copies, orr) if orr == orr else copies
        verdict = "ok" if tr <= 1.5 * yardstick else "SUPERLINEAR"
        orr_s = f"{orr:.1f}x" if orr == orr else "—"
        lines.append(
            f"| {name} | {b0} | {r0} | {b1} | {r1} | {tr:.1f}x | {orr_s} | {verdict} |"
        )
    lines += [
        "",
        "Adjudication notes:",
        "",
        "- `minhash_band_sweep` rejoined the probe in round 7: the loose",
        "  8x2 config's candidate mass (round-6: ~5e9 pairs, measured",
        "  executor OOM) is now bounded per (band, sig) bucket by",
        "  SWEEP_BUCKET_CAP=64 (lowest doc_ids kept, mirrored in the",
        "  oracle) with the truncation reported in `n_buckets_capped`.",
        "- `tfidf_cosine_pairs` is excluded BY CONSTRUCTION: the 31-term",
        "  fixture makes every doc pair a true result, so the 100x ground",
        "  truth is ~1e11 pairs — unmaterializable by any exact algorithm.",
        "  Fixture artifact (dense output), not plan superlinearity — the",
        "  10x sweep measured the same wall (>75 GB shuffle spill); see",
        "  the sf0.1 bench cost and the operator docstring's",
        "  df-cap/prefix-filter contract.",
        "- Banded rows (`dedup_minhash_pairs`, `minhash_band_sweep`,",
        "  `dedup_clusters_incremental`): candidate pairs concentrate in",
        "  copy-groups (~copies^2 per group), so wall growth above the",
        "  data ratio up to the output-mass ratio is the banding working.",
        "- Adaptive-LSH rows (`dedup_embedding_pairs_lsh`,",
        "  `dedup_embedding_clusters`, `knn_lsh_bucketed`): plane count",
        "  re-derives from n in-query, holding expected bucket population",
        "  ~128 — the rows certify pair generation tracks n across TWO",
        "  decades.",
        "- `dedup_embedding_clusters` additionally pays O(log diameter)",
        "  pointer-jumping rounds; component diameter grows with copy-group",
        "  size, so a modest extra factor over the pairs row is expected.",
        "- Iterative/curation rows: `bpe_train` lands ~1x because key-offset",
        "  replication leaves the word VOCABULARY unchanged — only the one",
        "  corpus-scale word count grows, measured proof the merge rounds",
        "  are vocab-sized as designed. `pipeline_end_to_end` lands ~1x",
        "  because its FIRST stage (exact dedup, min-doc_id keeper per text",
        "  hash) collapses the 100 identical replicas immediately — the",
        "  pipeline doing its job on a pathologically duplicated corpus.",
        "  `graph_pagerank` is a fixed iteration count over 100x edges and",
        "  `pack_sequences` two distributed prefix-sum levels — both well",
        "  under the data ratio.",
        "- Round-8 rows: `multimodal_decode` is embarrassingly parallel",
        "  per-row Python codec work (Arrow-batched), so its honest shape",
        "  is the data ratio with no shuffle term at all; ",
        "  `stream_cdc_store_live` runs real micro-batches whose sf0.1",
        "  cost is dominated by per-batch fixed overhead — a time ratio",
        "  far BELOW the data ratio is that overhead amortizing, and the",
        "  marginal slope is the per-batch data work.",
        "- Round-9 rows: `dedup_ngram_pairs`/`dedup_containment` run the",
        "  capped-posting exact-verify core and the cap ENGAGES at 100x",
        "  (max shingle df ~28k >> 1024), so candidate mass is cap-bounded",
        "  instead of Theta(sum df^2) — the uncapped core would attempt",
        "  ~7e11 join rows here. The rank key is the GLOBAL per-doc hash:",
        "  overlapping hot postings keep the SAME docs, so their pairs",
        "  collapse under distinct (a per-(shingle,doc) key measured",
        "  1.3e8 decorrelated pairs and failed this probe).",
        "  Their 100x OUTPUT legitimately collapses: pair coverage inside",
        "  100-copy clusters is hash-sampled by design (exact-copy dedup",
        "  owns that mass), so the yardstick is time vs data ratio.",
        "  `graph_label_prop` is 3 fixed rounds over 100x edges;",
        "  `dedup_paragraph` is one segment hash-agg + hash join.",
        "- `tfidf_cosine_zipf` is excluded for the tfidf_cosine_pairs",
        "  reason: key-offset replication multiplies every term's df by",
        "  `copies` WITHOUT growing the vocabulary, forcing the AllPairs",
        "  candidate mass toward copies^2 — a replication artifact, not",
        "  the plan. Its scale evidence is tools/tfidf_zipf_probe.py",
        "  (vocabulary grows with n, the realistic shape), whose measured",
        "  candidate reduction + crossover is appended below.",
        "",
    ]
    if only:
        print("SPARK_GRAFT_PROBE_ONLY set — results above, md NOT rewritten")
        return
    section = "\n".join(lines)
    with open(os.path.join(_REPO, "SCALING_100X.md"), "w") as f:
        f.write(section)
    splice_into_scaling(section)
    print("wrote SCALING_100X.md and spliced SCALING.md")


if __name__ == "__main__":
    main()
