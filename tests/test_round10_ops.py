"""Invariant tests for the round-10 batch — properties the
oracle-parity hash check cannot express: the dHash band-blocking is
LOSSLESS at the Hamming bar (banded pairs == brute-force pairs when no
bucket is capped), the dHash bits really come from the decoded GIF
pixel path (closed-form replica), and the audio fingerprint set equals
a pure-Python replica built from the closed-form waveform.
"""

from __future__ import annotations

import numpy as np

from dfs_w_mapreduce_spark.catalog import load_table


def _pal_luma(i: int) -> int:
    return (i * 17) % 256 + (i * 29) % 256 + (i * 43) % 256


def _dhash_closed_form(doc_id: int, n_chars: int) -> int:
    """Arithmetic twin of _build_image_phash: frame-0 GIF pixels from
    the generator, 9x8 NN luminance grid, horizontal difference bits
    packed MSB-first."""
    w, h = doc_id % 5 + 4, n_chars % 4 + 3

    def g(x: int, y: int) -> int:
        return _pal_luma((doc_id * 7 + x * 3 + y * 5) % 16)

    bits = 0
    for ty in range(8):
        sy = ty * h // 8
        for tx in range(8):
            sx0, sx1 = tx * w // 9, (tx + 1) * w // 9
            bits = (bits << 1) | (1 if g(sx1, sy) > g(sx0, sy) else 0)
    return bits


def test_image_phash_bits_match_decoded_pixels():
    """The UDF's hash (real build->LZW decode->palette path) equals the
    closed-form twin for a spread of (doc_id, n_chars) params — any
    codec or banding-order bug diverges here before it reaches Spark."""
    import pandas as pd

    from dfs_w_mapreduce_spark.operators.multimodal import _build_image_phash

    params = [(d, n) for d in (0, 1, 7, 123, 1000003) for n in (0, 5, 77, 999)]
    pdf = pd.DataFrame(params, columns=["doc_id", "n_chars"])
    (out,) = list(_build_image_phash(iter([pdf])))
    assert len(out) == len(params)
    for (doc_id, n_chars), (_, r) in zip(params, out.iterrows()):
        bits = _dhash_closed_form(doc_id, n_chars)
        assert (int(r.b0), int(r.b1), int(r.b2), int(r.b3)) == (
            bits & 0xFFFF,
            (bits >> 16) & 0xFFFF,
            (bits >> 32) & 0xFFFF,
            (bits >> 48) & 0xFFFF,
        )


def test_image_phash_banding_lossless_vs_bruteforce(spark, sf_dir):
    """Pigeonhole losslessness: at Hamming <= 4 over 4 disjoint 16-bit
    bands, every qualifying pair shares at least one exact band, so the
    banded+verified rollup must equal the brute-force O(n^2) rollup
    (no bucket exceeds the cap at this SF — asserted)."""
    from collections import Counter

    from dfs_w_mapreduce_spark.operators.multimodal import (
        IMG_BUCKET_CAP,
        IMG_HAM_T,
        q_dedup_image_phash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    hs = {r.doc_id: _dhash_closed_form(r.doc_id, r.n_chars) for r in docs}
    # precondition: no (band, key) bucket is capped at this SF
    buckets = Counter(
        (b, (v >> (16 * b)) & 0xFFFF) for v in hs.values() for b in range(4)
    )
    assert max(buckets.values()) <= IMG_BUCKET_CAP
    ids = sorted(hs)
    expect: dict[int, list[int]] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hs[a] ^ hs[b]).count("1")
            if ham <= IMG_HAM_T:
                expect.setdefault(a, []).append(ham)
    want = {
        a: (len(v), min(v), sum(1 for x in v if x == 0))
        for a, v in expect.items()
    }
    got = {
        r.doc_id: (r.n_similar, r.min_hamming, r.n_dup0)
        for r in q_dedup_image_phash(spark, sf_dir).collect()
    }
    assert got == want


def test_image_clusters_consistent_with_pairs(spark, sf_dir):
    """Components must partition the pair graph: every paired doc is
    clustered, cluster_id = min member, keeper flag matches, and a
    union-find replica over the brute-force pair set agrees."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        IMG_HAM_T,
        q_dedup_image_clusters,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    hs = {r.doc_id: _dhash_closed_form(r.doc_id, r.n_chars) for r in docs}
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hs[a] ^ hs[b]).count("1") <= IMG_HAM_T:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set[int]] = {}
    for x in list(parent):
        comps.setdefault(find(x), set()).add(x)
    want = {
        m: (root, m == root, len(members))
        for root, members in comps.items()
        for m in members
    }
    got = {
        r.doc_id: (r.cluster_id, r.is_keeper, r.n_members)
        for r in q_dedup_image_clusters(spark, sf_dir).collect()
    }
    assert got == want


def _fingerprints_closed_form(doc_id: int, n_chars: int) -> dict[int, tuple[int, int]]:
    """Pure-Python replica of the fingerprint pipeline from the
    closed-form waveform s(i) = (doc_id*7 + i*13) % 4096 - 2048."""
    nv = (n_chars % 1000 + 1) * (1 + doc_id % 2)
    v = [(doc_id * 7 + i * 13) % 4096 - 2048 for i in range(nv)]
    frames = [v[o : o + 256] for o in range(0, nv, 256)]
    doms, ils = [], []
    for fv in frames:
        dc = sum(fv)
        qc = sum(s * (1, 0, -1, 0)[i % 4] for i, s in enumerate(fv))
        qs = sum(s * (0, 1, 0, -1)[i % 4] for i, s in enumerate(fv))
        ny = sum(s * (1, -1)[i % 2] for i, s in enumerate(fv))
        e = (dc * dc, qc * qc + qs * qs, ny * ny)
        dom = 0 if e[0] >= e[1] and e[0] >= e[2] else (1 if e[1] >= e[2] else 2)
        doms.append(dom)
        ils.append(max(e).bit_length())
    fps: dict[int, tuple[int, int]] = {}
    for f in range(len(frames)):
        for dt in range(1, 4):
            if f + dt >= len(frames):
                break
            dil = max(-8, min(7, ils[f] - ils[f + dt]))
            hsh = ((doms[f] * 3 + doms[f + dt]) * 4 + dt) * 16 + dil + 8
            n, first = fps.get(hsh, (0, f))
            fps[hsh] = (n + 1, first)
    return fps


def test_audio_fingerprint_matches_replica(spark, sf_dir):
    """The Spark fingerprint table (real WAV build->decode->frame->
    peak->hash path) equals the closed-form replica per document."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        q_multimodal_audio_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    want = {}
    for r in docs:
        for hsh, (n, first) in _fingerprints_closed_form(r.doc_id, r.n_chars).items():
            want[(r.doc_id, hsh)] = (n, first)
    got = {
        (r.doc_id, r.fp_hash): (r.n, r.first_anchor)
        for r in q_multimodal_audio_fingerprint(spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_fertility_consistent_with_bpe_apply(spark, sf_dir):
    """Both queries ride the same encoded vocabulary, so per-source
    identities must hold: n_words equal, and mean_fertility ==
    tokens_post / n_words (recomputed from bpe_apply's totals)."""
    from dfs_w_mapreduce_spark.operators.pipeline import (
        q_bpe_apply,
        q_bpe_fertility,
    )

    apply_rows = {r.source: r for r in q_bpe_apply(spark, sf_dir).collect()}
    fert_rows = {r.source: r for r in q_bpe_fertility(spark, sf_dir).collect()}
    assert set(apply_rows) == set(fert_rows)
    for src, fr in fert_rows.items():
        ar = apply_rows[src]
        assert fr.n_words == ar.n_words
        assert fr.mean_fertility == round(ar.tokens_post / ar.n_words, 4)
        assert 1.0 <= fr.mean_fertility <= fr.max_fertility
        assert 0.0 <= fr.p_unsplit <= 1.0 and 0.0 <= fr.p_frag <= 1.0


def test_domain_rollup_partitions_corpus(spark, sf_dir):
    """Every document lands in exactly one domain; dup/pass rates are
    valid fractions; hosts per domain are the 3 synthesized
    subdomains at most."""
    from dfs_w_mapreduce_spark.operators.corpus import q_corpus_domain_rollup

    rows = q_corpus_domain_rollup(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 1 <= r.n_hosts <= 3
        assert 0.0 <= r.dup_rate < 1.0
        assert 0.0 <= r.len_pass_rate <= 1.0
        assert r.domain.endswith(".org") and r.domain.count(".") == 1


def test_url_canonicalization_rules(spark, sf_dir):
    """Closed-form replica of the canonicalizer: every raw URL must
    collapse to exactly lower-host, no :443, no utm query, no
    fragment, no trailing slash — and the per-source rollup must match
    the replica's counts."""
    from dfs_w_mapreduce_spark.operators.corpus import (
        URL_PATH_BUCKETS,
        q_url_canonical_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    ).collect()
    per_source: dict[str, dict] = {}
    for r in docs:
        canon = f"https://www.{r.source}.org/Page/{r.doc_id % URL_PATH_BUCKETS}"
        s = per_source.setdefault(
            r.source,
            {"n_raw": 0, "urls": set(), "frag": 0, "utm": 0, "port": 0,
             "keepers": {}},
        )
        s["n_raw"] += 1
        s["urls"].add(canon)
        s["frag"] += r.doc_id % 7 == 0
        s["utm"] += r.doc_id % 2 == 1
        s["port"] += r.doc_id % 3 == 0
        k = s["keepers"].get(canon)
        s["keepers"][canon] = r.doc_id if k is None else min(k, r.doc_id)
    got = {r.source: r for r in q_url_canonical_dedup(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, s in per_source.items():
        g = got[src]
        assert g.n_raw == s["n_raw"]
        assert g.n_canonical == len(s["urls"])
        assert g.n_dup_urls == s["n_raw"] - len(s["urls"])
        assert (g.n_fragment, g.n_tracking, g.n_default_port) == (
            s["frag"], s["utm"], s["port"],
        )
        assert g.min_keeper == min(s["keepers"].values())
        assert g.url_dup_rate == round(1.0 - len(s["urls"]) / s["n_raw"], 4)


def test_pii_audit_matches_python_re_replica(spark, sf_dir):
    """Third-engine replica: rebuild each doc's PII blob in Python,
    redact with `re` in the pinned order, and reproduce every rollup
    column — including the md5-prefix checksum of the redacted text,
    which pins the exact redacted corpus across Java regex, RE2, and
    Python `re`. Also asserts the redacted text is clean (no pattern
    survives its own redaction pass)."""
    import hashlib
    import re

    from dfs_w_mapreduce_spark.operators.corpus import (
        PII_A_EMAIL_RE,
        PII_A_IP_RE,
        PII_A_PHONE_RE,
        PII_A_SSN_RE,
        q_pii_audit,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).collect()
    agg: dict[str, list[int]] = {}
    order = (
        (PII_A_EMAIL_RE, "[EMAIL]"),
        (PII_A_SSN_RE, "[SSN]"),
        (PII_A_PHONE_RE, "[PHONE]"),
        (PII_A_IP_RE, "[IP]"),
    )
    for r in docs:
        d = r.doc_id
        blob = r.text
        if d % 3 == 0:
            blob += f" reach user{d}@{r.source}.net"
        if d % 5 == 0:
            blob += f" call 415-555-{d % 9000 + 1000}"
        if d % 7 == 0:
            blob += f" ssn {d % 900 + 100}-{d % 90 + 10}-{d % 9000 + 1000}"
        if d % 11 == 0:
            blob += f" from 10.{d % 256}.0.{d % 100}"
        ks = [len(re.findall(p, blob)) for p, _ in order]
        red = blob
        for p, tag in order:
            red = re.sub(p, tag, red)
        for p, _ in order:
            assert not re.search(p, red)
        rh = int(hashlib.md5(red.encode()).hexdigest()[:8], 16)
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += sum(ks) > 0
        a[2] += ks[0]  # email
        a[3] += ks[2]  # phone
        a[4] += ks[1]  # ssn
        a[5] += ks[3]  # ip
        a[6] += rh
    got = {r.source: r for r in q_pii_audit(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, a in agg.items():
        g = got[src]
        assert (g.n_docs, g.n_docs_pii) == (a[0], a[1])
        assert (g.n_email, g.n_phone, g.n_ssn, g.n_ip) == tuple(a[2:6])
        assert g.n_redactions == a[2] + a[3] + a[4] + a[5]
        assert g.pii_rate == round(a[1] / a[0], 4)
        assert g.redacted_checksum == a[6]


def test_audio_fingerprint_output_bounded(spark, sf_dir):
    """Scale invariant: per-doc fingerprint rows <= FP_FANOUT * frames
    (output is linear in corpus size by construction)."""
    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.operators.multimodal import (
        FP_FANOUT,
        q_multimodal_audio_fingerprint,
    )

    per_doc = (
        q_multimodal_audio_fingerprint(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").alias("k"), F.sum("n").alias("pairs"))
        .collect()
    )
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    for r in per_doc:
        nv = (docs[r.doc_id] % 1000 + 1) * (1 + r.doc_id % 2)
        nf = -(-nv // 256)
        assert r.k <= r.pairs <= FP_FANOUT * nf
