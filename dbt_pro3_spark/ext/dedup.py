"""Deduplication operators for document corpora.

Five escalating strategies, each the idiomatic Spark shape for its scale:

- exact        : groupBy(normalized text) keep min id — one shuffle on a
                 content hash; at 100 TB group on sha2(text) so the shuffle
                 key is 32 bytes, not the document.
- minhash_lsh  : pyspark.ml HashingTF → MinHashLSH approxSimilarityJoin —
                 banding avoids the O(n²) pair space.
- simhash      : 32-bit sign-vote fingerprint + byte-band candidate join +
                 hamming verify. Pure DataFrame ops (explode/groupBy/bit
                 ops) — no UDF, no cartesian product.
- ngram_jaccard: shingle explode → shingle-equality candidate pairs →
                 exact Jaccard verify (block-then-verify; hot shingles are
                 the skew hazard — cap or salt them at real scale).
- embedding    : cosine ≥ threshold pair join (delegates to similarity.py
                 norms; bucket with LSH first at real scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.readers import spread
from .similarity import cosine, with_norm
from .text import shingles, tokens

# Mersenne prime 2^31-1 for the affine MinHash permutations: with the base
# hash v < 2^32 and a < 2^30, a*v + b stays under 2^62 — no 64-bit overflow
# in either engine.
MINHASH_P = 2_147_483_647


def minhash_coeffs(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for h_i(v) = (a_i*v + b_i) mod MINHASH_P."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, 1 << 30)) | 1, int(rng.randint(0, MINHASH_P)))
        for _ in range(num_perm)
    ]


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text: (kept id, dup_count).

    Shuffle key is the md5 of the text, not the text itself — at corpus
    scale that's the difference between shuffling 100 TB and shuffling 2 TB.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    return (
        df.select(F.col(id_col), F.md5(norm.cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 5,
    jaccard_max_distance: float = 0.8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH (stock pyspark.ml).

    shingle → HashingTF sparse vector → MinHash signatures → banded
    similarity join. Returns (doc_a, doc_b, jaccard_distance) with
    doc_a < doc_b. Deterministic via fixed seed.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), shingles(F.col(text_col), 3).alias("sh")
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feat = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, jaccard_max_distance, distCol="jaccard_distance")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def _minhash_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_perm: int,
    bands: int,
    pair_filter=None,
):
    """Shared MinHash pipeline: per-doc distinct shingle hashes (sh),
    affine signatures (sigs), and banded candidate pairs (cand).

    One implementation serves both the banded-pairs key and the
    estimator-contract key — the determinism-critical stages (md5 base
    hash, affine permutations, band hashing, candidate equi-joins) exist
    exactly once, so the two keys' oracles can never drift apart. sh and
    sigs are each checkpointed once; every downstream branch (band loops,
    verify joins, estimator projections) reads the materialized tables.
    """
    r = num_perm // bands
    assert bands * r == num_perm, "num_perm must divide evenly into bands"
    coeffs = minhash_coeffs(num_perm)
    # per-doc shingle DEDUP happens in-row (array_distinct on the shingle
    # array before the explode), so the incidence never pays a
    # (doc, shingle) distinct shuffle; md5 + conv still run post-explode
    # in whole-stage codegen, and the ONE remaining corpus shuffle is the
    # doc-keyed signature aggregate below
    sh = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id_"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("shingle"),
    ).select(
        "doc_id_",
        F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("v"),
        # 8-byte equality surrogate for the exact verify (the
        # prefix_filter trick: 2^-64 collision odds; the oracle joining
        # on the string sees the same equalities)
        F.xxhash64("shingle").alias("h64"),
    )
    # the signature aggregate ALSO folds the per-doc sorted hash set, so
    # the exact verify downstream is an in-row intersection instead of
    # two incidence-sized joins plus a pair-keyed reduce
    sigs = sh.groupBy("doc_id_").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sort_array(F.collect_list("h64")).alias("hs"),
        *[
            F.min((F.col("v") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"sig{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id_",
        "n_sh",
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"sig{t * r + j}").cast("string") for j in range(r)]
                ).cast("binary")
            ).alias(f"mband{t}")
            for t in range(bands)
        ],
    ).localCheckpoint(eager=False)
    cand = None
    for t in range(bands):
        a = banded.select(F.col("doc_id_").alias("doc_a"), F.col(f"mband{t}").alias("bk"))
        b = banded.select(F.col("doc_id_").alias("doc_b"), F.col(f"mband{t}").alias("bk"))
        cond = (
            pair_filter(F.col("doc_a"), F.col("doc_b"))
            if pair_filter is not None
            else F.col("doc_a") < F.col("doc_b")
        )
        c = a.join(b, "bk").filter(cond).select("doc_a", "doc_b")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    # exact verify: broadcast the (small) candidate pair list onto the
    # per-doc sorted hash sets and intersect in-row
    da = sigs.select(F.col("doc_id_").alias("doc_a"), F.col("hs").alias("hs_a"))
    db = sigs.select(F.col("doc_id_").alias("doc_b"), F.col("hs").alias("hs_b"))
    common = (
        da.join(F.broadcast(cand), "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b"))
            .cast("bigint")
            .alias("common_shingles"),
        )
    )
    return sigs, common




def exact_common_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, common, n_a, n_b) for every pair sharing >= 1
    shingle — the sample-confined exact-truth stage shared by the dedup
    audit keys (recall audit, S-curve). Meant for BOUNDED samples only:
    the shingle self-join is quadratic in per-shingle document frequency
    by design (it is the ground truth the banded plans are graded
    against), so the caller confines it to a hash sample.

    Shape discipline: per-doc shingle dedup runs in-row (array_distinct
    before the explode — no (doc, shingle) distinct shuffle), and every
    join keys on xxhash64(shingle), so the strings never leave the first
    projection (the ngram_jaccard convention; the oracle joins on the
    string and gets the same equalities)."""
    sh = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("doc_id_"),
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
                "shingle"
            ),
        )
        .select("doc_id_", F.xxhash64("shingle").alias("sh_h"))
        .localCheckpoint(eager=False)  # 3 consumers: sizes + both pair sides
    )
    sizes = sh.groupBy("doc_id_").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id_").alias("doc_a"), "sh_h")
    b = sh.select(F.col("doc_id_").alias("doc_b"), "sh_h")
    tp = (
        a.join(b, "sh_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id_").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id_").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return tp.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")


def minhash_banded_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    min_common: int = 1,
    keep_sizes: bool = False,
    pair_filter=None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, fully deterministic and oracle-checkable
    (unlike the pyspark.ml MinHashLSH variant, whose banding internals are
    not SQL-replicable).

    Permutation i is an affine universal hash of a shared 32-bit base hash:
    h_i(s) = (a_i * v(s) + b_i) mod p with p = 2^31-1 and v(s) = first 32
    bits of md5(s) — ONE md5 per shingle, the rest integer arithmetic, all
    bit-identical across engines. The ``num_perm`` signatures (MIN of h_i
    over the doc's shingle set) split into ``bands`` bands of
    r = num_perm/bands rows; a pair is a CANDIDATE iff some band matches
    exactly (collision probability J^r per band, 1-(1-J^r)^bands overall —
    the classic LSH S-curve). Candidates then get an EXACT Jaccard verify
    over the full shingle sets. Every join is an equi-join on a band hash;
    no all-pairs. Stages shared with minhash_estimate_pairs via
    _minhash_stages.

    Output: (doc_a, doc_b, common_shingles, jaccard) for candidate pairs.
    """
    sigs, common = _minhash_stages(
        df, id_col, text_col, n, num_perm, bands, pair_filter=pair_filter
    )
    common = common.filter(F.col("common_shingles") >= min_common)
    counts = sigs.select("doc_id_", "n_sh")
    ca = counts.select(F.col("doc_id_").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id_").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cols = ["doc_a", "doc_b", "common_shingles"]
    if keep_sizes:
        cols += ["n_a", "n_b"]
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select(
            *cols,
            F.round(
                F.col("common_shingles").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common_shingles")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_estimate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash candidate pairs with BOTH the signature-agreement Jaccard
    ESTIMATE and the exact verify — the sketch-accuracy contract key.

    est_jaccard = (# of the num_perm signature components that agree) /
    num_perm, the textbook unbiased MinHash estimator; jaccard is the exact
    value over the full shingle sets. Emitting both makes the sketch's
    accuracy a driver-checkable output (and the estimator is affine-hash
    deterministic, so the oracle reproduces it bit-for-bit — unlike
    engine-native HLL/GK sketches, which only get bounded-error flags).

    Same scale shape as minhash_banded_pairs — the shingle/signature/band
    stages ARE minhash_banded_pairs' stages (_minhash_stages), so the two
    keys cannot drift; only the terminal estimator projection differs.
    """
    sigs, common = _minhash_stages(df, id_col, text_col, n, num_perm, bands)
    siga = sigs.select(
        F.col("doc_id_").alias("doc_a"),
        F.col("n_sh").alias("n_a"),
        *[F.col(f"sig{i}").alias(f"sa{i}") for i in range(num_perm)],
    )
    sigb = sigs.select(
        F.col("doc_id_").alias("doc_b"),
        F.col("n_sh").alias("n_b"),
        *[F.col(f"sig{i}").alias(f"sb{i}") for i in range(num_perm)],
    )
    agree = sum(
        (F.col(f"sa{i}") == F.col(f"sb{i}")).cast("int") for i in range(num_perm)
    )
    return (
        common.join(F.broadcast(siga), "doc_a")
        .join(F.broadcast(sigb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common_shingles",
            F.round(
                F.col("common_shingles").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common_shingles")).cast("double"),
                6,
            ).alias("jaccard"),
            agree.alias("n_sig_agree"),
            F.round(agree.cast("double") / F.lit(float(num_perm)), 6).alias(
                "est_jaccard"
            ),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash per document: per-token hash, sign-votes per bit.

    explode → one groupBy(doc) with `bits` conditional sums — a single
    shuffle keyed by doc id; reassembly is plain integer arithmetic.

    bits=32 (the registry/oracle surface): the per-token hash is the
    first 32 bits of md5 (decoded nibble-by-nibble from the hex string)
    rather than xxhash64 — md5's hex output is bit-identical across
    engines, which makes the whole fingerprint DuckDB-oracle-checkable.
    Hash quality is equivalent for sign-voting.

    bits=64 (the scale path, Manku/Jain/Das Sarma WWW'07): per-token
    xxhash64 (JVM-side, no oracle needed — this variant exists for
    candidate-generation scaling, see simhash_near_pairs). The wider
    signature lets the banding use 16-bit bands (65,536 bucket values
    per band instead of 256), which is what keeps band-bucket occupancy
    — and with it the candidate-join cost — sub-quadratic in distinct
    signatures on large corpora.
    """
    # explode -> hash in whole-stage codegen (hashing inside higher-order
    # array lambdas is interpreted per element — measured meaningfully
    # slower) -> ONE groupBy(doc). v = first 32 bits of md5 via base-16
    # conv, bit-identical to the oracle's nibble arithmetic.
    #
    # The per-bit vote counts are PACKED: each long accumulator carries four
    # 16-bit counter fields (bit 4j+f counts in field f of accumulator j),
    # so the hash-aggregate updates bits//4 buffer columns per row instead
    # of `bits` branchy conditional sums — measured ~2x on the exploded
    # token table, and the arithmetic is branch-free shifts. 16-bit fields
    # bound tokens-per-doc at 65535; the token array is sliced to that
    # prefix (fingerprinting a 65k-token prefix is standard practice and
    # keeps the packing overflow-free at any corpus scale).
    # bit b set in the final signature iff 2*count_b > n (strictly more 1s
    # than 0s) — identical to the sign of a ±1 vote sum, and exactly what
    # the oracle's conditional-sum SQL computes.
    if bits not in (32, 64):
        raise ValueError(f"simhash supports bits=32 (oracled) or 64 (scale); got {bits}")
    toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.slice(tokens(F.col(text_col)), 1, 65535)).alias("tok"),
    )
    hashed = toks.select(
        F.col(id_col),
        (
            F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
            .cast("bigint")
            if bits == 32
            else F.xxhash64("tok")
        ).alias("v"),
    )
    n_acc = bits // 4
    packs = []
    for j in range(n_acc):
        p = F.lit(0).cast("bigint")
        for f in range(4):
            p = p + F.shiftleft(
                F.shiftright(F.col("v"), 4 * j + f).bitwiseAND(F.lit(1)).cast("bigint"),
                16 * f,
            )
        packs.append(p.alias(f"p{j}"))
    votes = hashed.select(F.col(id_col), *packs).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p{j}").alias(f"p{j}") for j in range(n_acc)],
    )
    # bitwiseOR of shifted single bits, not a sum of 2**b literals: at
    # bits=64 the top bit (2**63) overflows a bigint literal; the OR form
    # is numerically identical at bits=32 (disjoint bit positions)
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        j, f = b // 4, b % 4
        count_b = F.shiftright(F.col(f"p{j}"), 16 * f).bitwiseAND(F.lit(65535))
        bit_b = F.when(count_b * 2 > F.col("n"), F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit_b, b))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into 4 equal bands
    (bits/4 wide); pairs sharing ANY band are candidates; verify with
    exact bit_count(xor).

    Default max_hamming=3 matches the banding's pigeonhole guarantee: a
    pair differing in ≤3 bits MUST agree on at least one of the 4 bands,
    so recall is exactly 1 at that radius. Asking for a larger
    max_hamming with this band layout would silently drop pairs whose
    differing bits straddle all four bands — raise the band count (b+1
    bands guarantee hamming ≤ b) rather than the radius.

    bits picks the scaling regime of candidate generation (the output
    semantics — pairs within hamming radius of a sign-vote fingerprint —
    are the same family): 32-bit signatures band into 8-bit values (256
    buckets per band; the oracled registry surface), so band-bucket
    occupancy grows ~D/256 in distinct signatures D and the per-band
    join cost ~D²/256 — fine to ~10⁵ distinct signatures, quadratic
    beyond. 64-bit signatures (Manku/Jain/Das Sarma WWW'07) band into
    16-bit values (65,536 buckets per band), pushing the same crossover
    out 256×; that is the 100 TB path, and
    tests/test_dedup_scaling_contract.py pins the occupancy gap on the
    driver corpus."""
    if max_hamming > 3:
        raise ValueError(
            "4-band banding only guarantees recall for hamming <= 3; "
            f"got max_hamming={max_hamming}. Use more bands for a larger radius."
        )
    width = bits // 4  # 4 bands always; pigeonhole covers hamming <= 3
    mask = (1 << width) - 1
    # one materialization of the (doc, signature) table — every stage below
    # reads it; recomputing would re-hash every token
    sigs = simhash(df, id_col, text_col, bits=bits).localCheckpoint(eager=False)
    # Candidate generation runs on DISTINCT signatures, not documents: a
    # duplicate-dense corpus puts thousands of docs on one signature, and a
    # doc-level band join would square that inside every hot bucket. At the
    # signature level each band bucket holds unique values only, so the
    # join cost scales with signature diversity regardless of how
    # duplicate-heavy the corpus is; doc pairs are re-expanded afterwards
    # through the (sig -> docs) membership — rows proportional to the
    # OUTPUT, which is irreducible.
    usig = sigs.select("simhash").distinct().localCheckpoint(eager=False)
    ubands = usig.select(
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), width * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    sa = ubands.select(F.col("simhash").alias("sig_a"), "band", "val")
    sb = ubands.select(F.col("simhash").alias("sig_b"), "band", "val")
    ham = F.expr("bit_count(sig_a ^ sig_b)").cast("int")
    sig_pairs = (
        sa.join(sb, ["band", "val"])
        .filter(F.col("sig_a") < F.col("sig_b"))
        .select("sig_a", "sig_b")
        .dropDuplicates(["sig_a", "sig_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
    )
    # expand: cross-signature pairs via membership joins (orientation fixed
    # by least/greatest), plus same-signature pairs (hamming 0)
    ma = sigs.select(F.col("simhash").alias("sig_a"), F.col(id_col).alias("da"))
    mb = sigs.select(F.col("simhash").alias("sig_b"), F.col(id_col).alias("db"))
    cross = (
        sig_pairs.join(ma, "sig_a")
        .join(mb, "sig_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    same = (
        sigs.alias("x")
        .join(sigs.alias("y"), "simhash")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(same)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
    max_df: int = 16,
    keep_sizes: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs sharing ≥ min_common shingles.

    Block-then-verify with a STOP-SHINGLE CAP (the standard fix for
    hot-shingle skew): shingles whose document frequency exceeds ``max_df``
    are excluded from CANDIDATE GENERATION only — a shingle shared by
    thousands of documents is boilerplate and contributes O(df²) candidate
    pairs while carrying no near-dup signal. Candidacy requires sharing
    >= min_common NON-hot shingles; the verify stage then adds the hot
    common count (from the tiny hot-incidence lists, candidates only), so
    reported common_shingles/jaccard are exact over the FULL shingle sets.
    A pair is missed only if fewer than min_common of its shared shingles
    are rarer than max_df — at that point the overlap is essentially
    boilerplate. The cap bounds the candidate join at
    sum_sh(min(df, max_df)²) pair-rows regardless of corpus size; without
    it one viral shingle is a quadratic blow-up.

    Output: (doc_a, doc_b, common_shingles, jaccard).
    """
    # join on the 8-byte xxhash64 of the shingle, not the shingle string —
    # the candidate-join shuffle carries fixed-size keys (collision odds
    # ~2^-64 per pair; immaterial vs the string-shuffle cost at scale).
    # xxhash runs AFTER the explode so it stays in whole-stage codegen
    # (hashing inside a higher-order transform is interpreted per element —
    # measured ~3x slower). The (doc, shingle-hash) incidence table feeds 5
    # consumers (counts, hot, both candidate sides, hot-verify), so it is
    # materialized once; at warehouse scale this is the persisted
    # fingerprint table, written once per corpus snapshot.
    sh = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("doc_id_"),
            # per-doc dedup in-row (array_distinct on the shingle strings
            # BEFORE the explode) — the (doc, hash) distinct shuffle the
            # pre-r7 shape paid never happens; xxhash still runs after
            # the explode so it stays in whole-stage codegen
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
                "shingle"
            ),
        )
        .select("doc_id_", F.xxhash64("shingle").alias("sh_h"))
        .localCheckpoint(eager=False)
    )
    counts = sh.groupBy("doc_id_").agg(F.count(F.lit(1)).alias("n_sh"))
    # hot-shingle list is tiny (only shingles with df > max_df) -> broadcast
    # anti-join; the candidate join never sees a hot key
    hot = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df_")).filter(
        F.col("df_") > max_df
    ).select("sh_h")
    capped = sh.join(F.broadcast(hot), "sh_h", "left_anti")
    a = capped.select(F.col("doc_id_").alias("doc_a"), "sh_h")
    b = capped.select(F.col("doc_id_").alias("doc_b"), "sh_h")
    # candidate generation AND capped-common counting in ONE join+aggregate;
    # min_common applies to the CAPPED common count here (a pair must share
    # >= min_common non-boilerplate shingles to be a candidate at all —
    # requiring only >=1 was measured to inflate the candidate set ~10x)
    cand = (
        a.join(b, "sh_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c_capped"))
        .filter(F.col("c_capped") >= min_common)
    )
    # exact total common = capped common + hot common, where the hot part is
    # counted ONLY for surviving candidates against the (tiny) hot-shingle
    # incidence lists — never a hot-key self-join, never the full sets
    hot_sh = sh.join(F.broadcast(hot), "sh_h", "left_semi")
    ha = hot_sh.select(F.col("doc_id_").alias("doc_a"), "sh_h")
    hb = hot_sh.select(F.col("doc_id_").alias("doc_b"), "sh_h")
    hot_common = (
        cand.select("doc_a", "doc_b")
        .join(ha, "doc_a")
        .join(hb, ["doc_b", "sh_h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c_hot"))
    )
    common = cand.join(hot_common, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        (F.col("c_capped") + F.coalesce("c_hot", F.lit(0))).alias("common_shingles"),
    )
    ca = counts.select(F.col("doc_id_").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id_").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cols = ["doc_a", "doc_b", "common_shingles"]
    if keep_sizes:
        cols += ["n_a", "n_b"]
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select(
            *cols,
            F.round(
                F.col("common_shingles").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common_shingles")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def embedding_near_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    bands: int = 4,
    bits_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH blocking + exact verify.

    The 100 TB shape: ``bands`` independent sign-random-projection tables of
    ``bits_per_band`` bits each; a pair is a CANDIDATE iff it collides in at
    least one band (classic OR-of-bands LSH). Candidates then get an exact
    rounded-cosine verify. No all-pairs join anywhere — each band join is an
    equi-join on its bucket id, so both sides hash-partition by bucket and
    the pair space shrinks ~2^bits_per_band-fold per band.

    Recall math (sign-LSH): a pair at angle θ collides in one band with
    p = (1 - θ/π)^bits_per_band, overall 1-(1-p)^bands. Recall 1 is NOT
    attainable for low thresholds: on the driver's random 64-dim corpus the
    pairs at cosine ≈ 0.4 (θ ≈ 66°) are the tail of the random-pair
    distribution — measured: no planted high-cosine dups, qualifying pairs
    form a continuum 0.40-0.51 — and any exact sub-quadratic blocking at
    that radius would have to block nearly the whole space. So this operator
    *defines* its semantics as blocking+verify (the oracle replicates the
    bands bit-for-bit and is hash-checked); crank bands/bits for the
    recall/cost point your threshold needs — at real near-dup thresholds
    (≥0.9, θ ≤ 26°) p ≈ 0.55/band at 4 bits and 8 bands give recall ≈ 0.99.
    """
    from .similarity import dot, hyperplanes

    planes = hyperplanes(dim, bands * bits_per_band, seed)
    e = with_norm(df, vec_col)
    bcols = []
    for t in range(bands):
        b = F.lit(0)
        for j in range(bits_per_band):
            lit = F.array(*[F.lit(float(x)) for x in planes[t * bits_per_band + j]])
            b = b + (dot(F.col("_v"), lit) > 0).cast("int") * (2 ** j)
        bcols.append(b.alias(f"band{t}"))
    # one materialization of (id, vec, norm, band buckets) — consumed by
    # 2*bands candidate branches plus both verify sides; recomputing would
    # re-run all bands*bits hyperplane dot products each time
    eb = e.select(F.col(id_col), F.col("_v"), F.col("_norm"), *bcols).localCheckpoint(
        eager=False
    )
    # verify INSIDE each band join: the vectors ride the (tiny, pre-join)
    # bucket rows and the exact rounded cosine + threshold run on the
    # streamed join output, so the candidate pair stream is never
    # materialized into a dedup shuffle nor re-joined twice to fetch
    # vectors (the pre-r7 shape shuffled millions of candidate id-pairs
    # three times; survivors above any useful threshold are a trickle).
    # A pair colliding in k bands computes its cosine k <= bands times —
    # cheap codegen arithmetic traded for three pair-stream shuffles.
    out = None
    for t in range(bands):
        a = eb.select(
            F.col(id_col).alias("vec_a"), F.col("_v").alias("va"),
            F.col("_norm").alias("na"), F.col(f"band{t}").alias("bk"),
        )
        bb = eb.select(
            F.col(id_col).alias("vec_b"), F.col("_v").alias("vb"),
            F.col("_norm").alias("nb"), F.col(f"band{t}").alias("bk"),
        )
        c = (
            a.join(bb, "bk")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select(
                "vec_a", "vec_b",
                # the zip_with/aggregate fold, NOT the unrolled element_at
                # sum: measured 2x FASTER here — the 64-term unrolled
                # projection blows the generated method past the codegen
                # size limit and the whole join stage falls back to
                # interpreted eval, which costs more than the fold's
                # per-element lambda dispatch ever did
                F.round(
                    cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")), 6
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
        out = c if out is None else out.unionByName(c)
    # identical (pair -> cosine) rows from multi-band collisions: keep one
    return out.dropDuplicates(["vec_a", "vec_b"])


#: Hard ceiling for the exact all-pairs path. 64k rows -> ~2.1e9 candidate
#: pairs, already the outer edge of a deliberate verify stage; anything
#: larger is a mistake — the caller wanted embedding_near_pairs_lsh.
EXACT_PAIRS_MAX_ROWS = 65_536


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    max_rows: int | None = EXACT_PAIRS_MAX_ROWS,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, id-ordered — EXACT
    all-pairs baseline (the verify-stage primitive; O(n²)/2 by definition).

    Use embedding_near_pairs_lsh as the corpus-scale entry point; keep this
    for bounded verify stages and as the recall oracle for tuning LSH
    parameters. Threshold applies to the ROUNDED cosine so the cut is
    reproducible bit-for-bit by the oracle.

    Guarded: refuses inputs larger than ``max_rows`` (one cheap count of the
    id column) so the quadratic join cannot silently plan over a full
    corpus. Pass ``max_rows=None`` only from a bounded verify stage that has
    already capped its candidate set.
    """
    if max_rows is not None:
        n = df.select(id_col).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_pairs is the EXACT O(n^2) verify primitive; "
                f"input has {n} rows > max_rows={max_rows}. Use "
                f"embedding_near_pairs_lsh for corpus-scale near-dup, or pass "
                f"max_rows=None from a bounded verify stage."
            )
    e = with_norm(df, vec_col).select(id_col, "_v", "_norm")
    a = e.select(
        F.col(id_col).alias("vec_a"), F.col("_v").alias("va"), F.col("_norm").alias("na")
    )
    b = e.select(
        F.col(id_col).alias("vec_b"), F.col("_v").alias("vb"), F.col("_norm").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        F.round(cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """AllPairs/PPJoin prefix filtering: EXACT Jaccard-threshold pair join
    with a candidate stage that provably misses nothing.

    Order every document's shingle set by global rarity (df asc, shingle);
    a pair with Jaccard >= t must share at least one shingle among each
    side's first |S| - ceil(t*|S|) + 1 rarest shingles (pigeonhole: missing
    the whole prefix leaves too few shingles to reach t). So candidates =
    equi-join on PREFIX shingles only — the frequent shingles that make the
    naive shingle join quadratic are exactly the ones prefixes exclude,
    and, unlike the stop-shingle cap (ngram_jaccard_pairs), recall at the
    threshold is exactly 1 by construction, not empirically.

    Scale shape: per-doc shingle dedup runs IN-ROW (array_distinct
    before the explode), so the incidence shuffles by doc exactly ONCE —
    the fold to a rarity-sorted (df, shingle, hash) struct array per
    document; the prefix selection is then an
    in-row slice of that array (no per-doc row_number window at all)
    and the verify-side sorted hash sets re-derive from the same array
    in-row; the df table is a shingle-keyed aggregate broadcast back;
    the candidate join keys on rare-by-definition prefix shingles
    (bounded fan-out); exact verify joins the (small) candidate pairs
    to the per-doc hash arrays — the pair list broadcasts, so the
    incidence never re-shuffles for verification — and counts the
    overlap with an in-row array_intersect, no pair-keyed reduce at all.
    All equality joins key on xxhash64(shingle) — 8 bytes instead of the
    shingle string (the ngram_jaccard trick; 2^-64 collision odds, and the
    oracle joining on the string gets the same equalities). Rarity ORDER
    ties break on the hash too (a total order per doc), so the string
    never rides a shuffle at all; the oracle tiebreaks on the string —
    a DIFFERENT but equally consistent global order, and the verified
    output is provably identical under any consistent order (see the
    packed-fold comment).

    All threshold arithmetic is EXACT integer rationals (threshold ->
    num/den via Fraction): Spark's binary double 0.8 and DuckDB's decimal
    literal 0.8 disagree at exact-ratio boundaries (0.8*80 = 64.0000..004
    as doubles), which flips ceil/comparison results between engines —
    integer cross-multiplication cannot.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator

    def ceildiv(p, q: int):
        # exact ceil(p/q) on integer columns: (p + q - 1 - (p+q-1) mod q)/q
        s = p + F.lit(q - 1)
        return ((s - s % q) / q).cast("bigint")
    sh = (
        # spread() before the explode: the shingle+hash pass is the key's
        # heaviest per-row work and otherwise runs entirely inside the
        # single-task scan stage of a one-file corpus (§2.5) — measured
        # ~4.3 s -> ~1.5 s for the whole key at sf0.1 on local[32]
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("doc"),
            # per-doc dedup in-row — no (doc, shingle) distinct shuffle;
            # the packed fold below is the ONE doc-keyed shuffle
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
                "shingle"
            ),
        )
        # the string itself never leaves this projection: every downstream
        # equality AND the rarity tiebreak run on the 8-byte hash, so the
        # checkpoint and both shuffles carry (doc, sh_h) only
        .select("doc", F.xxhash64("shingle").alias("sh_h"))
        .localCheckpoint(eager=False)  # feeds dfreq AND the packed fold
    )
    # dfreq is vocabulary-sized (distinct shingles), far smaller than the
    # incidence table — broadcast it back onto the incidence. At a
    # web-scale vocab that outgrows broadcast, this reverts to a shuffle
    # join — same plan the unigram-xent key documents for its LM table.
    dfreq = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    # ONE per-doc fold to the rarity-sorted struct array: array_sort on
    # struct(df, sh_h) compares fields in declaration order — ORDER BY
    # df with the 64-bit hash as the tiebreak ((df, sh_h) is unique per
    # doc). The hash order DIFFERS from the oracle's string tiebreak,
    # which is fine by construction: the pigeonhole recall guarantee
    # holds for ANY global rarity order applied consistently to both
    # sides, each engine's candidate set therefore contains every
    # qualifying pair, and the exact verify makes the FINAL pair set
    # independent of which consistent order selected the prefixes.
    # Rarity rank, set size, the prefix slice AND the verify-side sorted
    # hash set all derive from this array in-row — the per-doc
    # row_number/count windows and their full partition sort disappear.
    packed = (
        sh.join(F.broadcast(dfreq), "sh_h")
        .groupBy("doc")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "sh_h"))).alias("ss")
        )
        .localCheckpoint(eager=False)  # feeds pref + both verify sides
    )
    sz = F.size("ss").cast("bigint")
    docsets = packed.select(
        "doc",
        F.array_sort(F.transform("ss", lambda s: s.sh_h)).alias("hs"),
        sz.alias("sz"),
    )
    # pref: posexplode of the in-row prefix slice (rn = position + 1)
    plen = (sz - ceildiv(num * sz, den) + 1).cast("int")
    pref = packed.select(
        "doc",
        sz.alias("sz"),
        F.posexplode(
            F.slice(F.transform("ss", lambda s: s.sh_h), 1, plen)
        ).alias("rn0", "sh_h"),
    ).select("doc", "sh_h", (F.col("rn0") + 1).cast("bigint").alias("rn"), "sz")
    # PPJoin's two extra candidate filters (both exact, recall-preserving):
    # - length: J >= t needs den*min(szA,szB) >= num*max(szA,szB);
    # - positional: J >= t needs common >= ceil(num*(szA+szB)/(num+den)),
    #   and a match at rarity positions (rnA, rnB) bounds the remaining
    #   possible common by min(szA-rnA, szB-rnB)+1 (both sides sort by the
    #   SAME global rarity order). Filters run per matched prefix shingle
    #   BEFORE the distinct, so verify only sees pairs that can win.
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, "sh_h")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .filter(
            den * F.least(F.col("a.sz"), F.col("b.sz"))
            >= num * F.greatest(F.col("a.sz"), F.col("b.sz"))
        )
        .filter(
            F.least(F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")) + 1
            >= ceildiv(num * (F.col("a.sz") + F.col("b.sz")), num + den)
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # verify: the surviving pair list is tiny next to the incidence, so
    # broadcast IT onto the per-doc set arrays (twice) and compute the
    # overlap in-row — no incidence re-shuffle, no pair-keyed reduce
    da = docsets.select(
        F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    db = docsets.select(
        F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"),
        F.col("sz").alias("sz_b"),
    )
    common = (
        da.join(F.broadcast(cand), "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a", "doc_b", "sz_a", "sz_b",
            F.size(F.array_intersect("hs_a", "hs_b"))
            .cast("bigint")
            .alias("common_shingles"),
        )
    )
    jac = F.round(
        F.col("common_shingles").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("common_shingles")).cast("double"),
        6,
    )
    # threshold cut in exact integers too: J >= num/den <=>
    # common*(num+den) >= num*(szA+szB)
    return (
        common.filter(
            F.col("common_shingles") * (num + den)
            >= num * (F.col("sz_a") + F.col("sz_b"))
        )
        .withColumn("jaccard", jac)
        .select("doc_a", "doc_b", "common_shingles", "jaccard")
    )
