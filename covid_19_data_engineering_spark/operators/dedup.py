"""Deduplication operators over the ``documents`` table — the training-data
pipeline surface (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine). The reference has no dedup (its extracts are keyed upstream); these
are driver-mandated extensions designed for the 100 TB posture:

- exact:       hash-groupBy — one shuffle on a 128-bit fingerprint, no skew
               (hash keys are uniform by construction).
- MinHash+LSH: shingle -> 32 minhashes -> 8 bands of 4 -> bucket self-join.
               The band join only pairs rows sharing a bucket, so candidate
               generation is O(collisions), not O(n^2); the Jaccard verify
               runs on candidates only. All JVM-side (md5/conv/bit ops) — no
               Python in the path.
- SimHash:     60-bit fingerprint from md5-derived token bits; near-dups are
               fingerprints within small Hamming distance found via band
               join on 15-bit chunks (same collision-bounding idea).
- n-gram Jaccard: exact pairwise Jaccard over 3-gram shingle sets, blocked
               on (lang, shingle-count log-bucket). The length bucket is
               LOSSLESS: J(A,B) >= t implies min|set|/max|set| >= t, so
               matching pairs sit within one log_{1/t} bucket of each other
               — the join visits neighbor buckets and drops nothing.
- embedding cosine: near-dup pairs above a cosine threshold. The REGISTERED
               operator generates candidates with the shared hyperplane-LSH
               buckets (operators/vectors.py) and re-ranks candidates with
               exact cosine — O(collisions), not O(n^2). The all-pairs brute
               twin stays as a library function (recall baseline in tests;
               it is the scale anti-pattern, never the registered path).

Tokenization is a plain single-space split everywhere so the DuckDB oracle
can reproduce it exactly.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from covid_19_data_engineering_spark.operators.vectors import (
    _spread,
    cosine_sim,
    with_lsh_buckets,
)
from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# --- shared text primitives (exactly reproducible in DuckDB SQL) -----------


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles_col(tok: Column, k: int = 3) -> Column:
    """k-word shingles: slice a sliding window over the token array.
    Documents shorter than k tokens produce an empty set (sequence() would
    otherwise count DOWN from 1 and emit bogus windows)."""
    idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
    return F.when(F.size(tok) >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k)))
    )).otherwise(F.array().cast("array<string>"))




# --- engine-portable hashing primitives -------------------------------------
# Shared by minhash, simhash, and the hashed-shingle Jaccard: every hash is
# derived from md5 hex so a DuckDB oracle reproduces it bit-for-bit.

_MERSENNE31 = (1 << 31) - 1

# DuckDB twins: fold md5 hex chars into a BIGINT (15 chars = 60 bits for
# simhash; 8 chars = 32 bits for shingle hashes, taken mod 2^31-1).
_HEX_FOLD = (
    "list_reduce(list_transform(range(1, 16), "
    "i -> CAST(strpos('0123456789abcdef', substr(md5({v}), i, 1)) AS BIGINT) - 1), "
    "(a, b) -> a * 16 + b)"
)
_HEX_FOLD8 = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> CAST(strpos('0123456789abcdef', substr(md5({v}), i, 1)) AS BIGINT) - 1), "
    "(a, b) -> a * 16 + b)"
)


def _shingle_base_hash(sh: Column) -> Column:
    """31-bit integer from the md5 of a shingle (JVM-side, engine-portable).

    31 bits, not 60: (h * a + b) mod p then stays inside plain int64
    arithmetic (2^31 x 2^31 product < 2^62 — no overflow under ANSI), which
    keeps the whole signature stage in fast long math and a compact codegen
    function. The original 60-bit/decimal(38,0) variant compiled each affine
    transform to decimal multiply/mod over a 121-bit intermediate — ~20x
    slower per shingle and a 32x-duplicated giant expression tree. Collision
    risk at 31 bits is negligible for minhash estimation (birthday bound over
    ~10^6 distinct shingles per partition ≈ 10^-3 colliding pairs, and a
    collision only perturbs one of 32 signature slots)."""
    return F.conv(F.substring(F.md5(sh), 1, 8), 16, 10).cast("long") % _MERSENNE31


# --- exact dedup ------------------------------------------------------------


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Group rows by content fingerprint; one row per distinct content with
    the surviving (min) key and the duplicate count."""
    return (
        df.select(F.col(key_col), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(key_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(text)
    ORDER BY fingerprint
    """,
    doc="Exact dedup via md5 hash-groupBy; shuffle key is uniform by construction.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return exact_duplicate_groups(docs).orderBy("fingerprint")


# --- n-gram Jaccard (exact near-dup twin) -----------------------------------


def ngram_blocked_candidates(df: DataFrame, threshold: float, k: int = 3,
                             block_col: str = "lang",
                             length_blocking: bool = True) -> DataFrame:
    """Candidate pairs for exact Jaccard: (doc_a, doc_b, sh_a, sh_b).

    Block key is (block_col, shingle-count log-bucket). J(A,B) >= t forces
    |A∩B| >= t*max(|A|,|B|) and |A∩B| <= min(|A|,|B|), so min/max >= t and
    the two log_{1/t} bucket indices differ by at most 1 — side b emits its
    bucket and both neighbors, side a joins on its own bucket, and every
    qualifying pair collides EXACTLY once (no post-join dedup needed). Docs
    with empty shingle sets can never reach the threshold (0/x or NULL
    0/0 Jaccard) and are dropped up front, which also keeps log() defined.

    ``length_blocking=False`` falls back to the block_col-only join (the
    near-all-pairs shape) — kept for the equivalence/pruning test.

    Shingles are HASHED to int64 before the join (round-4): the pairwise
    array_intersect/array_union then runs integer compares instead of
    string compares — ~4x on the bench — and the DuckDB oracle applies the
    identical md5-fold, so even the (vanishingly rare, ~4e-5 per pair)
    within-set hash collisions reproduce bit-for-bit on both engines.
    """
    sh = _spread(df).select(
        F.col("doc_id"),
        F.col(block_col).alias("block"),
        F.array_distinct(
            F.transform(shingles_col(tokens_col("text"), k), _shingle_base_hash)
        ).alias("sh"),
    ).localCheckpoint(eager=True)
    # ^ materialize the shingle sets ONCE: both sides of the self-join (and
    # the explode side's 3x bucket fan-out) would otherwise re-run the
    # split -> shingle -> md5-fold pipeline per reference — the same
    # shared-working-set rule as minhash_bands (dedup.py:413)
    if not length_blocking:
        a, b = sh.alias("a"), sh.alias("b")
        cond = (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    else:
        # widen by half the output rounding step: the filter runs on
        # round(J, 4), so a pair at J = t - 5e-5 can still pass — size the
        # buckets for that slightly-lower effective threshold
        log_r = math.log(1.0 / max(threshold - 5e-5, 1e-9))
        sh = sh.where(F.size("sh") > 0).withColumn(
            "lb", F.floor(F.log(F.size("sh").cast("double")) / F.lit(log_r)).cast("int")
        )
        a = sh.alias("a")
        b = sh.select(
            "doc_id", "block", "sh",
            F.explode(F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)).alias("nb"),
        ).alias("b")
        cond = (
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.lb") == F.col("b.nb"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
    return a.join(b, cond).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sh").alias("sh_a"),
        F.col("b.sh").alias("sh_b"),
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float, k: int = 3,
                        block_col: str = "lang",
                        length_blocking: bool = True) -> DataFrame:
    """Exact pairwise Jaccard over k-shingle sets within a blocking key.

    The self-join is equi-keyed on (block, length bucket), so Spark shuffles
    each side once by block and compares within blocks only — the exact-match
    counterpart of LSH banding, with the length bucket bounding block size.
    For unblocked corpora use minhash_lsh_candidates instead.
    """
    cands = ngram_blocked_candidates(df, threshold, k, block_col, length_blocking)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    # try_divide: two sub-k-token docs both have empty shingle sets -> 0/0;
    # NULL here (dropped by the threshold filter) matches DuckDB's behavior
    jac = F.try_divide(inter, union)
    return (
        cands.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


@register(
    "dedup_ngram_jaccard",
    # the oracle hashes shingles with the same md5-fold the engine uses, so
    # the integer sets (collisions included) are identical on both sides
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, lang AS block,
             -- i ranges 1..len-2 so every shingle is a full 3-gram
             list_distinct(list_transform(
               list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                 i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
               ),
               g -> {_HEX_FOLD8.format(v='g')} % {_MERSENNE31}
             )) AS s
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35
    ORDER BY doc_a, doc_b
    """,
    doc="Exact 3-gram Jaccard near-dup pairs, blocked by lang (hashed "
    "shingle sets; engine-portable md5-fold).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, threshold=0.35).orderBy("doc_a", "doc_b")


# --- MinHash + LSH ----------------------------------------------------------

_N_HASHES = 32
_BANDS = 8
_ROWS_PER_BAND = _N_HASHES // _BANDS
# deterministic affine coefficients (odd multipliers, fixed offsets) — no
# runtime randomness so every run and every engine derives the same buckets
_HASH_COEFF = [((2 * i + 1) * 0x9E3779B9) % _MERSENNE31 for i in range(_N_HASHES)]
_HASH_OFFSET = [((i + 1) * 0xC2B2AE35) % _MERSENNE31 for i in range(_N_HASHES)]


def minhash_signatures(df: DataFrame, text_col: str = "text",
                      key_col: str = "doc_id") -> DataFrame:
    """doc_id -> minhash[32] over 3-word shingles, computed ROW-LOCALLY:
    each signature slot is an array_min over the per-shingle affine hashes,
    so the whole stage is a pure map — no explode, no groupBy, no shuffle.
    (An explode + per-doc min aggregation computes the same values but
    shuffles O(docs) signature rows; row-local also makes the operator
    legal inside Structured Streaming, where a pre-join aggregation on an
    unwatermarked stream is not.) Docs with fewer than k tokens have no
    shingles and drop out, matching the aggregate formulation's semantics.

    The shingle->base-hash array is materialized by a SEPARATE projection:
    the 32 mh_i expressions reference the materialized ``_h`` column instead
    of inlining the shingle/md5 subtree 32 times. CollapseProject leaves the
    two projections apart (the alias is referenced 32 times and the
    expression is not cheap), so md5 runs once per shingle, not 32 times —
    without this split the duplicated tree blew whole-stage codegen past its
    limits and the minhash family ran ~15x slower."""
    sh = shingles_col(tokens_col(text_col))
    # eligibility via token count: size(sh) > 0 would build the whole
    # shingle array once for the filter and again for the projection
    base = df.where(F.size(tokens_col(text_col)) >= 3).select(
        F.col(key_col),
        F.transform(sh, _shingle_base_hash).alias("_h"),
    )
    mins = [
        F.array_min(
            F.transform(
                F.col("_h"),
                lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE31),
            )
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(zip(_HASH_COEFF, _HASH_OFFSET))
    ]
    return base.select(F.col(key_col), *mins)


def minhash_bands(df: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """(key, sig, band, bucket) rows: each doc exploded into its _BANDS
    bucket assignments, signature carried along for the agreement count.
    Shared by the self-join candidates below and the two-sided
    cross-snapshot dedup (operators/llmprep.py)."""
    sig = minhash_signatures(df, text_col, key_col)
    return sig.select(
        F.col(key_col),
        F.array(*[F.col(f"mh_{i}") for i in range(_N_HASHES)]).alias("sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    # bucket key = the band's minhash values joined as text —
                    # engine-portable (a DuckDB oracle derives the identical
                    # key), unlike F.hash's Spark-internal murmur
                    F.concat_ws(
                        ",", *[F.col(f"mh_{b * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)]
                    ).alias("bucket"),
                )
                for b in range(_BANDS)
            ])
        ).alias("bb"),
    ).select(key_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_agreement(a_sig: Column, b_sig: Column) -> Column:
    """Fraction of agreeing minhash rows between two signatures (the
    Jaccard estimator), rounded like the SQL twin."""
    agree = F.size(
        F.filter(
            F.zip_with(a_sig, b_sig, lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return F.round(agree / F.lit(_N_HASHES), 4)


def exact_text_collapse(df: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Collapse shingle-eligible docs to one representative per exact text.

    Returns ``(reps, members)``: ``reps`` is (key, text) restricted to the
    min-key row of each md5(text) group, ready for signature building;
    ``members`` is the (key, rep, _fp) mapping used to re-attach exact-dup
    members after a band join.

    Text rides THROUGH the fingerprint window shuffle and into the single
    checkpoint, which buys two things at once: (1) reps needs no join back
    to the corpus (one scan total), and (2) the downstream signature map
    inherits the shuffle's hash-partitioning — without it, a small local
    input is one parquet split and the whole md5/minhash pipeline runs in
    ONE task while every other core idles (at 100 TB maxPartitionBytes
    yields thousands of splits, but the shuffle spread costs nothing and
    the checkpointed (key, text, fp, rep) set is exactly the LSH working
    table you would persist for incremental dedup anyway).

    Eligibility (>= k tokens, else no shingles) is checked on the token
    count — building the full shingle array just to test emptiness would
    evaluate the expensive expression once in the filter and again in the
    signature projection."""
    eligible = df.where(F.size(tokens_col(text_col)) >= 3).select(
        F.col(key_col), F.col(text_col), F.md5(F.col(text_col)).alias("_fp")
    )
    mapped = eligible.withColumn(
        "_rep", F.min(key_col).over(Window.partitionBy("_fp"))
    ).localCheckpoint(eager=True)
    reps = mapped.where(F.col(key_col) == F.col("_rep")).select(key_col, text_col)
    members = mapped.select(F.col(key_col), F.col("_rep").alias("rep"), "_fp")
    return reps, members


def _minhash_rep_pairs(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Band-join candidates computed over ONE REPRESENTATIVE per exact text.

    Returns ``(rep_pairs, members)``:
    - ``rep_pairs``: (rep_a, rep_b, est_jaccard) — distinct colliding
      representative pairs from the banded self-join;
    - ``members``: (key, rep) — every shingle-eligible doc mapped to its
      group's representative (min key per md5(text)).

    THE hot-bucket fix (round-3 verdict #1): a corpus with m byte-identical
    copies of a boilerplate page previously put m rows in the same bucket in
    all 8 bands, so the candidate join emitted O(m^2) pairs per dup set —
    and web corpora at 100 TB have m in the 10^4..10^6 range. Identical text
    means identical shingles, signatures, and band buckets, so collapsing to
    min-key-per-fingerprint BEFORE banding is strictly less work with the
    same information: the band join sees each content once, and exact-dup
    membership is re-attached afterwards by the callers that need it.
    The collapse key is md5 of the RAW text (not the normalized curation
    fingerprint) because only byte-identical text guarantees identical
    minhash bands.

    The bands are still eagerly materialized before the self-join: both
    aliases otherwise recompute the whole shingle->md5->32-signature
    pipeline once per side. The streaming path (stream_snapshot_dedup)
    calls minhash_bands directly — checkpointing is illegal on a streaming
    DF, and stream batches are pre-deduped upstream.
    """
    reps, members = exact_text_collapse(df, text_col, key_col)
    bands = minhash_bands(reps, text_col, key_col).localCheckpoint(eager=True)
    return band_self_pairs(bands, key_col), members


def band_self_pairs(bands: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Distinct colliding pairs from a (materialized) band table self-join:
    (rep_a, rep_b, est_jaccard). Callers that hold several band tables
    (the incremental manifest) reuse one checkpoint across self- and
    cross-joins instead of re-deriving signatures per composition stage."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("rep_a"),
            F.col(f"b.{key_col}").alias("rep_b"),
            minhash_agreement(F.col("a.sig"), F.col("b.sig")).alias("est_jaccard"),
        )
        .distinct()
    )


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs via banded LSH over minhash signatures.

    Docs agreeing on all rows of at least one band share a bucket; the
    bucket equi-join emits only colliding pairs. Returns distinct pairs with
    the estimated Jaccard (fraction of agreeing minhashes).

    The expensive stage (the banded self-join) runs over one representative
    per exact text (``_minhash_rep_pairs``); the full pair set — identical
    to the naive formulation, as the oracle twin verifies — is then
    reconstructed by expansion:
    - cross-group pairs: every member of rep_a's group pairs with every
      member of rep_b's group at the reps' estimated Jaccard (identical
      text -> identical signature, so the estimate is exact for members);
    - within-group pairs: exact copies agree on all 32 minhashes, so every
      in-group pair carries est_jaccard = 1.0 by construction.
    The expansion joins are equi-keyed on the representative/fingerprint and
    produce output proportional to the TRUE pair count — the irreducible
    size of this query's answer — while the band join itself stays
    O(content-distinct collisions).
    """
    rep_pairs, members = _minhash_rep_pairs(df, text_col, key_col)
    ma = members.select(F.col(key_col).alias("_ka"), F.col("rep").alias("_ra"))
    mb = members.select(F.col(key_col).alias("_kb"), F.col("rep").alias("_rb"))
    cross = (
        rep_pairs.join(ma, F.col("_ra") == F.col("rep_a"))
        .join(mb, F.col("_rb") == F.col("rep_b"))
        .select(
            F.least("_ka", "_kb").alias("doc_a"),
            F.greatest("_ka", "_kb").alias("doc_b"),
            "est_jaccard",
        )
    )
    wa = members.select(F.col(key_col).alias("doc_a"), "_fp")
    wb = members.select(F.col(key_col).alias("doc_b"), "_fp")
    within = (
        wa.join(wb, "_fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("est_jaccard"))
    )
    return cross.unionByName(within)


# DuckDB twin of the full minhash pipeline. Every stage is engine-portable
# by construction: shingle hash = fold of the first 8 md5 hex chars mod
# 2^31-1 (same as Spark's conv(substring(md5,1,8),16,10) % p — _HEX_FOLD8
# near the top of this module), affine transforms in plain BIGINT
# (2^31 x 2^31 product < 2^62 — no wide arithmetic needed on either
# engine), band bucket = the band's minhash values joined as text. SimHash
# keeps the 15-char/60-bit fold (_HEX_FOLD).


def minhash_agree_sql() -> str:
    """Signature-agreement count between band-join sides a and b."""
    return " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(_N_HASHES)
    )


def minhash_pipeline_ctes() -> str:
    """The shared CTE chain (shingles -> hashes -> signatures -> bands);
    composable into WITH clauses by this oracle and the cluster oracle."""
    mins = ",\n             ".join(
        f"CAST(MIN((h * {a} + {b}) % {_MERSENNE31}) AS BIGINT) AS mh_{i}"
        for i, (a, b) in enumerate(zip(_HASH_COEFF, _HASH_OFFSET))
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT *, {band} AS band, concat_ws(','"
        + "".join(f", mh_{band * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND))
        + ") AS bucket FROM sig"
        for band in range(_BANDS)
    )
    return f"""toks AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
             )) AS s
      FROM documents
    ),
    sh AS (SELECT doc_id, unnest(s) AS shingle FROM toks),
    h AS (SELECT doc_id, {_HEX_FOLD8.format(v='shingle')} % {_MERSENNE31} AS h FROM sh),
    -- MATERIALIZED: sig is referenced by all 8 band branches and bands by
    -- both self-join sides; without the hint DuckDB inlines (re-evaluates)
    -- the whole shingle->hash->min pipeline per reference
    sig AS MATERIALIZED (
      SELECT doc_id,
             {mins}
      FROM h GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
      {band_selects}
    )"""


def _minhash_oracle_sql() -> str:
    agree = minhash_agree_sql()
    return f"""
    WITH {minhash_pipeline_ctes()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST({agree} AS DOUBLE) / {_N_HASHES}, 4) AS est_jaccard
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE ROUND(CAST({agree} AS DOUBLE) / {_N_HASHES}, 4) >= 0.3
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle_sql(),
    doc="MinHash(32)+LSH(8x4) candidate near-dup pairs with estimated "
    "Jaccard. Fully deterministic and engine-portable (md5-derived shingle "
    "hashes, fixed affine coefficients, concat band buckets), so the DuckDB "
    "oracle replicates the entire pipeline stage by stage.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        minhash_lsh_candidates(docs)
        .where(F.col("est_jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ----------------------------------------------------------------


def simhash_col(tok: Column, bits: int = 60) -> Column:
    """60-bit SimHash: per token take md5-derived bits, sum +1/-1 per bit
    position, sign -> fingerprint bit. Pure JVM expression (no UDF).
    60 bits (15 md5 hex chars) keep every intermediate inside a signed
    int64 under ANSI arithmetic.

    SINGLE-PASS vote accumulation (round-3 verdict #3): one ``aggregate()``
    folds the token-hash array into a ``bits``-element vote vector
    (``zip_with`` against a constant mask array), so the token array — and
    the md5 behind it — is walked ONCE per row. The previous formulation
    built ``bits`` independent ``aggregate()`` expressions, each re-walking
    the tokens and re-deriving the hash: 60x the array traversals and a
    60x-duplicated codegen subtree (the same trap fixed for the minhash
    ``_h`` materialization)."""
    token_hash = F.transform(
        tok, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    votes = F.aggregate(
        token_hash,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda v, m: v + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda fp, x: fp + x,
    )


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(key_col), simhash_col(tokens_col(text_col)).alias("simhash"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance over SimHash, found via band join:
    fingerprints within distance d must agree exactly on at least one of
    d+1 15-bit chunks, so the chunk equi-join bounds the pair space."""
    fp = simhash_fingerprints(_spread(df))
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), c * 15).bitwiseAND(F.lit(0x7FFF)).alias("val"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _simhash_oracle_sql(bits: int = 60, max_hamming: int = 3) -> str:
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    th AS (SELECT doc_id, {_HEX_FOLD.format(v='t')} AS h FROM tok),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM th GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, {fp} AS simhash FROM votes),
    chunked AS (SELECT doc_id, simhash, unnest([0, 1, 2, 3]) AS chunk FROM fp),
    chunks AS (
      SELECT doc_id, simhash, chunk,
             (simhash >> (chunk * 15)) & 32767 AS val
      FROM chunked
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_simhash",
    oracle=_simhash_oracle_sql(),
    doc="SimHash(60) fingerprint near-dup pairs within Hamming distance 3 "
    "(4x15-bit chunk band join). md5-derived token bits are engine-portable, "
    "so the DuckDB oracle rebuilds the fingerprints bit by bit.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return simhash_near_pairs(docs).orderBy("doc_a", "doc_b")


# --- embedding cosine near-dup ----------------------------------------------
# cosine_sim is re-exported from operators.vectors (shared with similarity).


def embedding_cosine_pairs_brute(em: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All-pairs cosine — the O(n^2) recall baseline. NEVER the registered
    path: the full-table broadcast + cross product dies far below 100 TB.
    Kept so tests can pin the LSH path's recall against exact truth."""
    a, b = em.alias("a"), em.alias("b")
    cos = cosine_sim(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_lsh_near_pairs(em: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Near-dup pairs via hyperplane-LSH candidate generation + exact cosine
    re-rank. Candidates must share at least one of 16 (table, bucket) cells;
    at cosine >= 0.95 the per-table collision prob is ~0.65, so the chance a
    true near-dup pair misses ALL 16 tables is (1-0.65)^16 ≈ 5e-8 — the
    output matches the brute twin, but the join is O(collisions) and nothing
    is broadcast. The exact-cosine filter runs BEFORE the pair distinct so
    the dedup shuffle carries only (id, id, cosine) survivors, never the
    embedding arrays."""
    bk = with_lsh_buckets(em, "embedding", "vec_id")
    a, b = bk.alias("a"), bk.alias("b")
    cos = cosine_sim(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


_EMB_COSINE_THRESHOLD = 0.4  # the synthetic embeddings are near-orthogonal
# random vectors (max pair cosine ~0.51 at 500 rows), so 0.95 would make the
# registered query vacuously empty; 0.4 keeps real survivors flowing through
# the candidate join + re-rank at every SF.


def _embedding_cosine_oracle_sql() -> str:
    """DuckDB twin of the LSH-candidate path. At threshold 0.4 the 16-table
    recall is ~0.94 (not ~1.0 as at 0.95), so an all-pairs oracle would
    legitimately disagree; instead the oracle rebuilds the bucket
    assignments (shared CTEs, bit-identical planes) and re-ranks exactly the
    same candidate set."""
    from covid_19_data_engineering_spark.operators.vectors import lsh_bucket_ctes

    return f"""
    WITH {lsh_bucket_ctes()},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bkt a JOIN bkt b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM (
      SELECT c.vec_a, c.vec_b,
             ROUND(list_cosine_similarity(ea.e, eb.e), 4) AS cosine
      FROM cand c
      JOIN emb ea ON ea.vec_id = c.vec_a
      JOIN emb eb ON eb.vec_id = c.vec_b
    ) WHERE cosine >= {_EMB_COSINE_THRESHOLD}
    ORDER BY vec_a, vec_b
    """


@register(
    "dedup_embedding_cosine",
    oracle=_embedding_cosine_oracle_sql(),
    doc=f"Embedding-cosine near-dup pairs (>={_EMB_COSINE_THRESHOLD}) via "
    "LSH-bucketed candidate generation + exact re-rank; the oracle rebuilds "
    "the deterministic hyperplane buckets so both engines score the same "
    "candidate set.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    return embedding_lsh_near_pairs(em, threshold=_EMB_COSINE_THRESHOLD).orderBy(
        "vec_a", "vec_b"
    )
