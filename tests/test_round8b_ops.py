"""Invariant tests for the round-8 second operator batch — semantic
properties the oracle-parity hash check cannot express: from-scratch
Python replicas of the Gopher verdict battery, PMI ranking, entropy,
the count-min estimate, lag-k autocorrelation, and the balanced
sampler's membership."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from dfs_w_mapreduce_spark.catalog import load_table


def _toks(text: str) -> list[str]:
    # ASCII \s to mirror Java-regex \s+ semantics exactly (round-7
    # advice: str.split() is Unicode-whitespace and can drift).
    return [t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t]


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gopher_verdict_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        GOPHER_DUP2_CAP,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_STOP_KINDS,
        GOPHER_MIN_WORDS,
        GOPHER_MWL_HI,
        GOPHER_MWL_LO,
        STOPWORDS,
        q_quality_gopher,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_source: dict[str, list[bool]] = {}
    for r in docs:
        w = _toks(r.text)
        grams = [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
        cnt = Counter(grams)
        tot = sum(n * len(g) for g, n in cnt.items())
        dup = sum(n * len(g) for g, n in cnt.items() if n > 1)
        dup2 = round(dup / tot, 4) if tot else 0.0
        nw = len(w)
        mwl = (len(r.text) - (nw - 1)) / nw if nw else 0.0
        sk = len(set(w) & set(STOPWORDS))
        ok = (
            GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
            and GOPHER_MWL_LO <= mwl <= GOPHER_MWL_HI
            and dup2 <= GOPHER_DUP2_CAP
            and sk >= GOPHER_MIN_STOP_KINDS
        )
        per_source.setdefault(r.source, []).append(ok)
    expect = {
        (src, len(v), sum(v)) for src, v in per_source.items()
    }
    got = {
        (r.source, r.n_docs, r.n_pass)
        for r in q_quality_gopher(spark, sf_dir).collect()
    }
    assert got == expect


def test_collocations_pmi_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
        q_text_collocations,
    )

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    uni: Counter = Counter()
    big: Counter = Counter()
    n_bigrams = 0
    for r in docs:
        w = _toks(r.text)
        uni.update(w)
        big.update(f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1))
        n_bigrams += max(len(w) - 1, 0)
    m_tokens = sum(uni.values())
    rows = []
    for g, c in big.items():
        if c < PMI_MIN_COUNT:
            continue
        w1, w2 = g.split(" ")
        pmi = (
            math.log2(c / n_bigrams)
            - math.log2(uni[w1] / m_tokens)
            - math.log2(uni[w2] / m_tokens)
        )
        rows.append((g, c, uni[w1], uni[w2], round(pmi, 4)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    expect = rows[:PMI_TOP_K]
    got = [
        (r.bigram, r.c_xy, r.n_w1, r.n_w2, r.pmi)
        for r in q_text_collocations(spark, sf_dir).collect()
    ]
    assert got == expect


def test_entropy_bounds_and_all_row(spark, sf_dir):
    """0 <= H <= log2(n_types) per row, and the ALL row's token mass
    equals the per-source total (the re-aggregation must lose
    nothing)."""
    from dfs_w_mapreduce_spark.operators.text_analysis import q_text_entropy

    rows = q_text_entropy(spark, sf_dir).collect()
    per = [r for r in rows if r.source != "ALL"]
    alls = [r for r in rows if r.source == "ALL"]
    assert len(alls) == 1
    for r in rows:
        assert -1e-9 <= r.entropy_bits <= math.log2(max(r.n_types, 2)) + 1e-9
        assert 0 < r.type_token_ratio <= 1
        assert 0 <= r.hapax_frac <= 1
    assert alls[0].n_tokens == sum(r.n_tokens for r in per)
    # ALL types <= sum of per-source types (shared vocab collapses)
    assert alls[0].n_types <= sum(r.n_types for r in per)


def test_cms_estimate_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        q_cms_sketch,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    users = [r.user_id for r in ev]
    sketch: Counter = Counter()
    for u in users:
        for j in range(CMS_DEPTH):
            sketch[(j, _md5_int(f"{j}:{u}") % CMS_WIDTH)] += 1
    exact = Counter(users)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = {}
    for u, n in top:
        est = min(sketch[(j, _md5_int(f"{j}:{u}") % CMS_WIDTH)] for j in range(CMS_DEPTH))
        expect[u] = (n, est)
    got = {r.user_id: (r.exact_n, r.cms_est) for r in q_cms_sketch(spark, sf_dir).collect()}
    assert got == expect
    for n, est in got.values():
        assert est >= n  # the count-min overestimate law


def test_ts_autocorr_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.analytics import (
        ACF_MAX_LAG,
        q_ts_autocorr,
    )
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    days = sorted({r.day for r in ev})
    lo, hi = days[0], days[-1]
    spine = []
    d = lo
    while d <= hi:
        spine.append(d)
        d = d + __import__("datetime").timedelta(days=1)
    counts: Counter = Counter((r.event_type, r.day) for r in ev)
    types = sorted({r.event_type for r in ev})
    expect = {}
    for t in types:
        series = [counts.get((t, d), 0) for d in spine]
        for k in range(1, ACF_MAX_LAG + 1):
            xs, ys = series[k:], series[:-k]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
            expect[(t, k)] = (n, round(num / den, 4) if den else None)
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf)
        for r in q_ts_autocorr(spark, sf_dir).collect()
    }
    assert got == expect


def test_sample_balanced_membership(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.pipeline import q_sample_balanced

    em = load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    by_label: dict[int, list[int]] = {}
    for r in em:
        by_label.setdefault(r.label, []).append(r.vec_id)
    m = min(len(v) for v in by_label.values())
    expect = {}
    for lab, ids in by_label.items():
        kept = sorted(ids, key=lambda v: (_md5_int(str(v)), v))[:m]
        fp = hashlib.md5(",".join(str(v) for v in sorted(kept)).encode()).hexdigest()
        expect[lab] = (len(ids), m, True, fp)
    got = {
        r.label: (r.n_total, r.n_kept, r.balanced, r.ids_fp)
        for r in q_sample_balanced(spark, sf_dir).collect()
    }
    assert got == expect


def test_anomaly_seasonal_matches_python_replica(spark, sf_dir):
    """The integer 3-sigma predicate and the reported z must both
    match a from-scratch replica over (type, day, hour) cells."""
    from dfs_w_mapreduce_spark.operators.analytics import q_anomaly_seasonal
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .collect()
    )
    cells: Counter = Counter((r.event_type, r.day, r.hour) for r in ev)
    base: dict[tuple, list[int]] = {}
    for (t, d, h), x in cells.items():
        base.setdefault((t, h), []).append(x)
    expect = {}
    for (t, d, h), x in cells.items():
        xs = base[(t, h)]
        n, sx, sxx = len(xs), sum(xs), sum(v * v for v in xs)
        dev, var_n2 = n * x - sx, n * sxx - sx * sx
        if dev * dev > 9 * var_n2:
            expect[(t, d, h)] = (
                x,
                round(sx / n, 4),
                round(dev / math.sqrt(var_n2), 4),
            )
    got = {
        (r.event_type, r.day, r.hour): (r.x, r.baseline_mean, r.z)
        for r in q_anomaly_seasonal(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture should produce at least one seasonal anomaly"


def test_stream_topk_live_is_streaming_and_matches_batch(spark, sf_dir):
    """The live leaderboard must equal the batch top-10 with the same
    tie-break (finite-replay equivalence)."""
    from dfs_w_mapreduce_spark.streaming.windows import q_stream_topk_live
    from pyspark.sql import functions as F

    got = [
        (r.user_id, r.n_events) for r in q_stream_topk_live(spark, sf_dir).collect()
    ]
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
        .collect()
    )
    assert got == [(r.user_id, r.n) for r in batch]


def test_dedup_containment_matches_python_replica(spark, sf_dir):
    """Full replica over exact shingle sets; also pins the law
    containment >= jaccard on every emitted row."""
    from dfs_w_mapreduce_spark.operators.dedup import CONTAIN_T, q_dedup_containment

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {}
    for r in docs:
        w = [t for t in re.split(r"\s+", r.text, flags=re.ASCII) if t]
        sh[r.doc_id] = {f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)}
    ids = sorted(sh)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = len(sh[a] & sh[b])
            if not c:
                continue
            na, nb = len(sh[a]), len(sh[b])
            jac = round(c / (na + nb - c), 4)
            if round(c / na, 4) >= CONTAIN_T:
                expect[(a, b)] = (na, nb, round(c / na, 4), jac)
            if round(c / nb, 4) >= CONTAIN_T:
                expect[(b, a)] = (nb, na, round(c / nb, 4), jac)
    got = {
        (r.doc_sub, r.doc_sup): (r.n_sub, r.n_sup, r.containment, r.jaccard)
        for r in q_dedup_containment(spark, sf_dir).collect()
    }
    assert got == expect
    for n_sub, n_sup, cont, jac in got.values():
        assert cont >= jac - 1e-9


def test_bigram_kn_matches_python_replica(spark, sf_dir):
    """Interpolated KN per-doc mean NLL against a from-scratch
    replica (counts, continuation counts, identical FP expression
    order, round-10 term quantization)."""
    from decimal import Decimal

    from dfs_w_mapreduce_spark.operators.corpus import KN_DISCOUNT, q_text_bigram_kn

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    occ_by_doc: dict[int, list[tuple[str, str]]] = {}
    c12: Counter = Counter()
    c1: Counter = Counter()
    for r in docs:
        w = _toks(r.text)
        ps = list(zip(w, w[1:]))
        occ_by_doc[r.doc_id] = ps
        c12.update(ps)
        c1.update(p[0] for p in ps)
    n1f: Counter = Counter(p[0] for p in c12)
    n1b: Counter = Counter(p[1] for p in c12)
    nbt = len(c12)
    expect = {}
    for doc, ps in occ_by_doc.items():
        if not ps:
            continue
        terms = []
        for p in ps:
            pkn = (c12[p] - KN_DISCOUNT) / c1[p[0]] + (
                (KN_DISCOUNT * n1f[p[0]]) / c1[p[0]] * n1b[p[1]]
            ) / nbt
            terms.append(Decimal(str(round(-math.log(pkn), 10))))
        expect[doc] = (len(ps), round(float(sum(terms)) / len(ps), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.mean_nll_kn)
        for r in q_text_bigram_kn(spark, sf_dir).collect()
    }
    assert got == expect


def test_join_runtime_bloom_plan_bit_and_result(spark, sf_dir):
    """bloom_active must come back TRUE (the runtime filter really was
    injected) and the aggregate must equal the plain-join batch twin
    (bloom false positives re-checked by the join)."""
    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.operators.layout import q_join_runtime_bloom

    rows = q_join_runtime_bloom(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0].bloom_active
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    twin = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("s"),
        )
        .collect()[0]
    )
    assert rows[0].n_lines == twin.n and rows[0].sum_qty == twin.s


def test_keyphrases_match_python_replica(spark, sf_dir):
    """Full RAKE replica: stopword islands, deg/freq, top-15 with the
    (score desc, phrase) tie-break."""
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        RAKE_MAX_WORDS,
        RAKE_TOP_K,
        STOPWORDS,
        q_text_keyphrases,
    )

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    occ = []
    for r in docs:
        run: list[str] = []
        for t in _toks(r.text):
            if t in STOPWORDS:
                if run:
                    occ.append(tuple(run))
                run = []
            else:
                run.append(t)
        if run:
            occ.append(tuple(run))
    occ = [w for w in occ if len(w) <= RAKE_MAX_WORDS]
    freq: Counter = Counter()
    deg: Counter = Counter()
    for words in occ:
        for t in words:
            freq[t] += 1
            deg[t] += len(words)
    phr: Counter = Counter(occ)
    rows = [
        (
            " ".join(words),
            len(words),
            n,
            round(sum(deg[t] / freq[t] for t in words), 4),
        )
        for words, n in phr.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    expect = rows[:RAKE_TOP_K]
    got = [
        (r.phrase, r.n_words, r.n_occurrences, r.rake_score)
        for r in q_text_keyphrases(spark, sf_dir).collect()
    ]
    assert got == expect


def test_audio_dft_matches_closed_form_replica(spark, sf_dir):
    """Exact-bin DFT energies recomputed from the closed-form sample
    stream (the builder->decoder->DFT path must agree bit-for-bit),
    plus the Parseval-style bound e_bin <= nv * sum(s^2) per bin."""
    from dfs_w_mapreduce_spark.operators.multimodal import q_multimodal_audio_dft

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    expect = {}
    for r in docs:
        nv = (r.n_chars % 1000 + 1) * (1 + r.doc_id % 2)
        s = [(r.doc_id * 7 + i * 13) % 4096 - 2048 for i in range(nv)]
        dc = sum(s)
        qc = sum(v * (1, 0, -1, 0)[i % 4] for i, v in enumerate(s))
        qs = sum(v * (0, 1, 0, -1)[i % 4] for i, v in enumerate(s))
        ny = sum(v * (1, -1)[i % 2] for i, v in enumerate(s))
        e_q, e_n, e_dc = qc * qc + qs * qs, ny * ny, dc * dc
        dom = (
            "dc" if e_dc >= e_q and e_dc >= e_n
            else ("quarter" if e_q >= e_n else "nyquist")
        )
        expect[r.doc_id] = (nv, dc, e_q, e_n, dom)
        power = nv * sum(v * v for v in s)
        assert e_q <= power and e_n <= power and e_dc <= power
    got = {
        r.doc_id: (r.nv, r.dc, r.e_quarter, r.e_nyquist, r.dominant)
        for r in q_multimodal_audio_dft(spark, sf_dir).collect()
    }
    assert got == expect


def test_chunked_stream_source_equals_batch_scan(spark, sf_dir):
    """The streaming offset reader must produce exactly the batch
    DataSourceReader's chunk aggregate (same oracle, two engines),
    and the reader's offset arithmetic must cover every chunk
    exactly once."""
    from dfs_w_mapreduce_spark.sources.chunked_source import ChunkedTextStreamReader
    from dfs_w_mapreduce_spark.sources.roundtrip import (
        q_source_chunked_scan,
        q_source_chunked_stream_live,
    )

    batch = {
        (r.chunk_id, r.n_lines, r.max_line, r.checksum)
        for r in q_source_chunked_scan(spark, sf_dir).collect()
    }
    live = {
        (r.chunk_id, r.n_lines, r.max_line, r.checksum)
        for r in q_source_chunked_stream_live(spark, sf_dir).collect()
    }
    assert live == batch
    # offset reader unit semantics: one full drain, then empty
    rd = ChunkedTextStreamReader(
        {"path": f"{sf_dir}/documents.parquet", "lines_per_chunk": "100"}
    )
    rows, off = rd.read(rd.initialOffset())
    rows = list(rows)
    assert off == {"chunk": rd._n_chunks()} and len(rows) > 0
    again, off2 = rd.read(off)
    assert list(again) == [] and off2 == off
    # replay of a committed range is deterministic
    replay = list(rd.readBetweenOffsets({"chunk": 0}, off))
    assert replay == rows
    # a replay starting PAST chunk 0 (restart recovery / grown file)
    # must emit the absolute chunk ids, not first_chunk-shifted ones:
    # chunks [2, 4) of a many-chunk reader are ids {2, 3} and equal
    # the corresponding slice of a full scan
    rd_small = ChunkedTextStreamReader(
        {"path": f"{sf_dir}/documents.parquet", "lines_per_chunk": "3"}
    )
    assert rd_small._n_chunks() >= 5
    full = list(rd_small.readBetweenOffsets({"chunk": 0}, {"chunk": rd_small._n_chunks()}))
    part = list(rd_small.readBetweenOffsets({"chunk": 2}, {"chunk": 4}))
    assert {cid for cid, _, _ in part} == {2, 3}
    assert part == [r for r in full if r[0] in (2, 3)]


def test_scene_cuts_match_closed_form_replica(spark, sf_dir):
    """Histogram L1 distances recomputed from the closed-form pixel
    generator; the decoded path must agree exactly, and is_cut must
    be the quarter-mass rule."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        GIF_COLORS,
        q_multimodal_scene_cuts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    expect = {}
    for r in docs:
        w, h = r.doc_id % 5 + 4, r.n_chars % 4 + 3
        nf = r.doc_id % 3 + 2
        hists = []
        for f in range(nf):
            hist = [0] * GIF_COLORS
            for pp in range(w * h):
                hist[(r.doc_id * 7 + f * 13 + (pp % w) * 3 + (pp // w) * 5) % GIF_COLORS] += 1
            hists.append(hist)
        for f in range(1, nf):
            d = sum(abs(hists[f][c] - hists[f - 1][c]) for c in range(GIF_COLORS))
            expect[(r.doc_id, f)] = (d, w * h, d * 4 > w * h)
    got = {
        (r.doc_id, r.frame_idx): (r.l1_dist, r.n_pixels, r.is_cut)
        for r in q_multimodal_scene_cuts(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[2] for v in got.values()) and not all(v[2] for v in got.values())


def test_holt_forecast_matches_python_replica(spark, sf_dir):
    """Holt fold replicated sequentially in Python over the same
    zero-filled series; every output field must match after round-4."""
    from dfs_w_mapreduce_spark.operators.analytics import (
        HOLT_ALPHA,
        HOLT_BETA,
        q_ts_holt_forecast,
    )
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    days = sorted({r.day for r in ev})
    spine = []
    d = days[0]
    while d <= days[-1]:
        spine.append(d)
        d += __import__("datetime").timedelta(days=1)
    counts: Counter = Counter((r.event_type, r.day) for r in ev)
    expect = {}
    for t in sorted({r.event_type for r in ev}):
        xs = [float(counts.get((t, d), 0)) for d in spine]
        l = xs[0]
        b = xs[1] - xs[0] if len(xs) >= 2 else 0.0
        for x in xs[1:]:
            nl = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (nl - l) + (1.0 - HOLT_BETA) * b
            l = nl
        expect[t] = (
            len(xs), round(l, 4), round(b, 4),
            round(l + b, 4), round(l + 7 * b, 4),
        )
    got = {
        r.event_type: (r.n_days, r.level, r.trend, r.forecast_1d, r.forecast_7d)
        for r in q_ts_holt_forecast(spark, sf_dir).collect()
    }
    assert got == expect


def test_changepoint_matches_python_replica(spark, sf_dir):
    """CUSUM peak recomputed in exact integers over the zero-filled
    series; the located day, the statistic, and both means must
    match, and cusum_n must telescope to zero."""
    from dfs_w_mapreduce_spark.operators.analytics import q_ts_changepoint
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    days = sorted({r.day for r in ev})
    spine = []
    d = days[0]
    while d <= days[-1]:
        spine.append(d)
        d += __import__("datetime").timedelta(days=1)
    counts: Counter = Counter((r.event_type, r.day) for r in ev)
    expect = {}
    for t in sorted({r.event_type for r in ev}):
        xs = [counts.get((t, d), 0) for d in spine]
        n, sx = len(xs), sum(xs)
        cus, acc, pref = [], 0, 0
        prefs = []
        for x in xs:
            acc += n * x - sx
            pref += x
            cus.append(acc)
            prefs.append(pref)
        assert cus[-1] == 0
        best = max(range(n), key=lambda i: (abs(cus[i]), -i))
        ti = best + 1
        expect[t] = (
            spine[best], ti, n, abs(cus[best]),
            round(prefs[best] / ti, 4),
            round((sx - prefs[best]) / (n - ti), 4) if n > ti else None,
        )
    got = {
        r.event_type: (
            r.change_day, r.t_index, r.n_days, r.max_abs_cusum,
            r.mean_before, r.mean_after,
        )
        for r in q_ts_changepoint(spark, sf_dir).collect()
    }
    assert got == expect


def test_markov_entropy_matches_python_replica(spark, sf_dir):
    """Conditional entropies and the entropy rate replicated from raw
    transitions; bounds 0 <= H <= log2(n_successors) pinned."""
    from dfs_w_mapreduce_spark.operators.analytics import q_markov_entropy

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    counts: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            counts[(a.event_type, b.event_type)] += 1
    row_n: Counter = Counter()
    for (f, _), n in counts.items():
        row_n[f] += n
    expect = {}
    for f in row_n:
        h = -sum(
            (n / row_n[f]) * math.log2(n / row_n[f])
            for (ff, _), n in counts.items()
            if ff == f
        )
        succ = sum(1 for (ff, _) in counts if ff == f)
        expect[f] = (row_n[f], succ, round(h, 4))
        assert -1e-9 <= h <= math.log2(succ) + 1e-9
    grand = sum(row_n.values())
    rate = round(
        sum((row_n[f] / grand) * expect[f][2] for f in row_n), 4
    )
    expect["ALL"] = (grand, sum(e[1] for f, e in expect.items()), rate)
    got = {
        r.from_type: (r.n_transitions, r.n_successors, r.cond_entropy_bits)
        for r in q_markov_entropy(spark, sf_dir).collect()
    }
    assert got == expect
