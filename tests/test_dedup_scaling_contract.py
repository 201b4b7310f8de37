"""Candidate-volume linearity contract for the banded dedup family.

The round-8 scaling probe misread host contention as runtime growth on
ext_dedup_minhash_banded / ext_dedup_simhash (SCALE.md §14: quiet-host
re-measure shows 1.07x / 1.15x on 10x data). Wall-clock probes can always
be fooled by load; the quantity that actually decides 100 TB viability —
how many candidate pairs the banding emits as the corpus grows — cannot.
This suite pins THAT directly, on the driver's own 500-doc (sf0.01) vs
5000-doc (sf0.1) corpora:

- MinHash: verified candidates 25 -> 256 and band-bucket pair bound
  89 -> 917 at pin time (~10x on 10x docs; a quadratic pocket would read
  ~100x), max band-bucket occupancy 3 -> 4.
- SimHash: the signature-level banding keeps every band bucket at
  distinct-signature cardinality, so bucket growth is bounded by
  signature diversity regardless of duplicate density.

Ceilings are ~3x the measured values — loose enough to survive a
regenerated corpus with different seeds, far below the quadratic
signature (another 10x would trip them immediately).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

SF_SMALL_DIR = "/root/testdata/sf0.01"
SF_BIG_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def corpora(spark):
    small = spark.read.parquet(f"{SF_SMALL_DIR}/documents.parquet")
    big = spark.read.parquet(f"{SF_BIG_DIR}/documents.parquet")
    return small, big, small.count(), big.count()


def _minhash_stats(docs):
    from dbt_pro3_spark.ext import dedup as ded

    sigs, common = ded._minhash_stages(docs, "doc_id", "text", 3, 16, 4)
    n_cand = common.count()
    banded = sigs.select(
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"sig{t * 4 + j}").cast("string") for j in range(4)]
                ).cast("binary")
            ).alias(f"mband{t}")
            for t in range(4)
        ]
    )
    occ = None
    for t in range(4):
        g = banded.groupBy(F.col(f"mband{t}").alias("bk")).count()
        occ = g if occ is None else occ.unionByName(g)
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pair_bound"),
        F.max("count").alias("max_occ"),
    ).first()
    return n_cand, int(row.pair_bound), int(row.max_occ)


def test_minhash_candidate_volume_linear(corpora):
    """Candidates and the band-bucket join bound must grow ~linearly with
    the corpus: sub-quadratic banding is the entire point of LSH. Measured
    at pin time: 25 -> 256 candidates (10.2x), 89 -> 917 bucket pairs
    (10.3x) on exactly 10x documents."""
    small, big, n_small, n_big = corpora
    scale = n_big / n_small  # 10x for the driver corpora
    c_s, b_s, _ = _minhash_stats(small)
    c_b, b_b, _ = _minhash_stats(big)
    assert c_s > 0 and b_s > 0, "probe corpus produced no candidates"
    assert c_b <= 3 * scale * c_s, (
        f"minhash verified candidates grew {c_b / c_s:.1f}x on {scale:.0f}x "
        f"docs ({c_s} -> {c_b}) — superlinear banding; re-tune bands or "
        "check for a degenerate (duplicate-dense) band bucket"
    )
    assert b_b <= 3 * scale * b_s, (
        f"minhash band-bucket pair bound grew {b_b / b_s:.1f}x on "
        f"{scale:.0f}x docs ({b_s} -> {b_b}) — the equi-join cost itself "
        "is growing superlinearly"
    )


def test_minhash_bucket_occupancy_bounded(corpora):
    """No quadratic pocket: the largest band bucket must stay tiny (the
    per-bucket join cost is occupancy^2). Measured 3 at 500 docs, 4 at
    5000 docs; ceiling 64 leaves room for corpus regeneration while still
    catching a hot bucket (a degenerate corpus would put thousands of
    docs in one bucket)."""
    _, big, _, _ = corpora
    _, _, max_occ = _minhash_stats(big)
    assert max_occ <= 64, (
        f"largest minhash band bucket holds {max_occ} docs — a hot bucket "
        "this size makes the candidate join quadratic in it; salt the band "
        "key or raise the band count"
    )


def _simhash_max_occ(docs, bits):
    from dbt_pro3_spark.ext import dedup as ded

    width, mask = bits // 4, (1 << (bits // 4)) - 1
    usig = ded.simhash(docs, "doc_id", "text", bits=bits).select("simhash").distinct()
    occ = None
    for i in range(4):
        g = usig.groupBy(
            F.shiftright(F.col("simhash"), width * i)
            .bitwiseAND(F.lit(mask))
            .alias("val")
        ).count()
        occ = g if occ is None else occ.unionByName(g)
    return occ.agg(F.max("count")).first()[0]


def test_simhash_64bit_banding_breaks_the_hot_bucket(corpora):
    """The 32-bit registry surface bands into 8-bit values: only 256
    bucket values per band, and on this homogeneous corpus the sign-votes
    correlate — measured 1,189 of ~4,700 distinct signatures sharing ONE
    byte value at 5,000 docs (a quadratic pocket as D grows). The 64-bit
    scale path (simhash bits=64, 16-bit bands -> 65,536 bucket values)
    must materially collapse that occupancy. Measured at pin time:
    1,189 -> 178 (6.7x). Signatures still cluster under the wide hash —
    sign-votes are driven by the corpus' global token distribution, so
    homogeneous text correlates bits regardless of hash width — but the
    per-band join cost is occupancy², so 6.7x lower occupancy is ~45x
    less work in the hottest bucket, and the gap widens with corpus
    diversity. Pin both sides: the 32-bit skew is real (>256, above the
    uniform bound — this is WHY the wide path exists), and the wide path
    stays well below it."""
    _, big, _, n_big = corpora
    occ32 = _simhash_max_occ(big, 32)
    occ64 = _simhash_max_occ(big, 64)
    assert occ32 > 256, (
        f"32-bit max band occupancy is {occ32} — the documented hot-bucket "
        "skew vanished; if the corpus changed, re-measure and update this "
        "contract (the 64-bit path's reason-to-exist is this number)"
    )
    assert occ64 <= 512, (
        f"64-bit simhash max band-bucket occupancy is {occ64} at {n_big} "
        "docs (pin-time value 178) — the 16-bit banding stopped spreading "
        "signatures; the scale path has regressed"
    )
    assert occ64 * 4 <= occ32, (
        f"64-bit occupancy ({occ64}) is not materially below 32-bit "
        f"({occ32}) — the wide banding no longer buys scaling headroom"
    )


def test_simhash_64bit_recall_on_exact_duplicates(corpora):
    """Recall contract for the scale path: a pair with IDENTICAL text has
    identical token multisets, hence identical signatures under ANY token
    hash — it must surface at hamming 0 in both the 32-bit and the 64-bit
    variant (banding recall is exactly 1 at radius 0 by pigeonhole).
    Exact-text pairs are the only pairs where the two hash widths are
    GUARANTEED to agree: a near-dup's flipped tokens move vote counts
    near the majority boundary, and whether a bit flips depends on the
    token hash, so radius->radius containment between widths does not
    hold in general (verified empirically: neither direction does)."""
    from dbt_pro3_spark.ext import dedup as ded

    # sf0.1 is the only driver corpus with exact-text clones (8 surplus
    # rows); sf0.01/sf0.001 have none
    _, big, _, _ = corpora
    exact = {
        (r.doc_a, r.doc_b)
        for r in (
            big.selectExpr("doc_id", "md5(text) AS h")
            .alias("x")
            .join(big.selectExpr("doc_id", "md5(text) AS h").alias("y"), "h")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
            )
            .collect()
        )
    }
    assert exact, "driver corpus should contain exact-text duplicate clusters"
    for bits in (32, 64):
        got = {
            (r.doc_a, r.doc_b)
            for r in ded.simhash_near_pairs(big, max_hamming=0, bits=bits).collect()
            if r.hamming == 0
        }
        missing = exact - got
        assert not missing, (
            f"bits={bits}: exact-text duplicate pairs missing from "
            f"hamming-0 output: {sorted(missing)[:5]} — banding recall "
            "broke at radius 0"
        )


def test_prefix_filter_rarity_ordering_bounds_buckets(corpora):
    """ext_dedup_prefix_filter's candidate join keys on each doc's RAREST
    shingles (PPJoin prefix). The join cost is sum(df_pref²) over prefix
    buckets, so the guard that matters is that rarity ordering actually
    selects low-df shingles: measured max prefix-bucket occupancy is 3 at
    500 docs and 10 at 5,000 docs (vs the hottest RAW shingle df in the
    hundreds). If the rarity sort broke (e.g. the (df, hash) struct order
    regressed), hot shingles would enter prefixes and this count would
    jump to raw-df scale (hundreds+). Growth on THIS corpus is documented
    as superlinear-but-far-from-quadratic (SCALE.md §15: Heaps-law vocab
    growth creeps prefix dfs up — bucket pair bound 1,611 -> 430,449 on
    10x docs while the hottest RAW shingle df is only 25); the pin is the
    occupancy ceiling, deliberately NOT linearity."""
    from fractions import Fraction

    from dbt_pro3_spark.ext.dedup import shingles

    _, big, _, _ = corpora
    num = Fraction(0.5).limit_denominator(10_000).numerator
    den = Fraction(0.5).limit_denominator(10_000).denominator
    sh = big.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("shingle"),
    ).select("doc", F.xxhash64("shingle").alias("sh_h"))
    dfreq = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    packed = (
        sh.join(F.broadcast(dfreq), "sh_h")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "sh_h"))).alias("ss"))
    )
    sz = F.size("ss").cast("bigint")
    t = num * sz + F.lit(den - 1)
    plen = (sz - (t - t % den) / den + 1).cast("int")
    pref = packed.select(
        F.explode(F.slice(F.transform("ss", lambda s: s.sh_h), 1, plen)).alias("sh_h")
    )
    stats = (
        pref.groupBy("sh_h")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
    )
    raw_hot = dfreq.agg(F.max("df")).first()[0]
    assert stats.mx <= 64, (
        f"max prefix-bucket occupancy is {stats.mx} (pin-time 10; hottest "
        f"raw shingle df {raw_hot}) — rarity ordering is letting hot "
        "shingles into prefixes; the candidate join is no longer bounded "
        "by rare-by-definition keys"
    )
    assert stats.mx <= raw_hot, (
        f"prefix occupancy ({stats.mx}) exceeds the hottest raw shingle "
        f"df ({raw_hot}) — impossible under correct rarity ordering; the "
        "prefix selection is broken"
    )
